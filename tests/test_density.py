"""KDE density surface (operators/density.py) — brute-force parity over
randomized point sets, kernel-support edges, duplicate points, and the
map-only plan shape (no join, single shuffle)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark.operators import density


def _brute(points, cell, radius):
    """Reference surface: for every grid cell, scan all points."""
    r2 = radius * radius
    half = cell // 2
    r_cells = math.ceil(radius / cell)
    out: dict[tuple[int, int], list[int]] = {}
    for px, py in points:
        for di in range(-r_cells, r_cells + 1):
            for dj in range(-r_cells, r_cells + 1):
                ci, cj = px // cell + di, py // cell + dj
                d2 = (px - (ci * cell + half)) ** 2 + (py - (cj * cell + half)) ** 2
                if d2 <= r2:
                    out.setdefault((ci, cj), []).append(r2 - d2)
    return {
        k: (len(ws), sum(ws)) for k, ws in out.items()
    }


def _run(spark, points, cell, radius):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(points)], "q_id long, qx long, qy long"
    )
    rows = density.kde_surface(df, cell=cell, radius=radius).collect()
    return {(r["ci"], r["cj"]): (r["npts"], r["density"]) for r in rows}


points_st = st.lists(
    st.tuples(st.integers(0, 30000), st.integers(0, 30000)), min_size=1, max_size=40
)


@settings(max_examples=10, deadline=None)
@given(points=points_st, cell=st.sampled_from([1000, 4000]), rfac=st.integers(1, 3))
def test_kde_matches_brute_force(spark, points, cell, rfac):
    radius = cell * rfac // 2 + 1  # exercises r_cells 1..2
    assert _run(spark, points, cell, radius) == _brute(points, cell, radius)


def test_kde_duplicate_points_accumulate(spark):
    pts = [(5000, 5000)] * 3
    got = _run(spark, pts, 4000, 6000)
    assert got == _brute(pts, 4000, 6000)
    # the point's own cell (1,1) centered at (6000,6000): d²=2·10⁶, w=R²−d²
    assert got[(1, 1)] == (3, 3 * (6000 * 6000 - 2 * 1000 * 1000))


def test_kde_support_boundary_exact(spark):
    # point at distance exactly R from a cell center is INCLUDED (d² ≤ R²)
    cell, radius = 10, 5
    # centers at (5,5), (15,5), ...; point (10,5) is exactly 5 from both
    got = _run(spark, [(10, 5)], cell, radius)
    assert got == {(0, 0): (1, 0), (1, 0): (1, 0)}


def test_kde_rejects_bad_params(spark):
    df = spark.range(1).select(
        F.col("id").alias("qx"), F.col("id").alias("qy")
    )
    with pytest.raises(ValueError):
        density.kde_surface(df, cell=0, radius=5)
    with pytest.raises(ValueError):
        density.kde_surface(df, cell=10, radius=0)


def test_kde_plan_is_map_expand_plus_one_aggregate(spark):
    """Scale-shape pin: no join operator anywhere in the plan — the
    candidate generation is a bounded array explode, and the only
    exchange is the final hashpartitioning on (ci, cj)."""
    df = spark.range(100).select(
        (F.col("id") * 37 % 20000).alias("qx"), (F.col("id") * 91 % 20000).alias("qy")
    )
    plan = (
        density.kde_surface(df, cell=4000, radius=6000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
