"""Spatial overlay join (operators/overlay.py) — exactness + plan shape.

The reference-point rule must emit every positive-area pair EXACTLY once
(pairs whose covers share many cells are the regression surface), and the
plan must stay a plain cell equi-join: no CartesianProduct, no
distinct/dropDuplicates aggregate after the join.
"""

from __future__ import annotations

import numpy as np
import pytest

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import overlay


def _brute_pairs(a: dict, b: dict) -> dict[tuple[int, int], tuple[int, int]]:
    out = {}
    for i in range(len(a["zone_id"])):
        for j in range(len(b["zone_id"])):
            wx = min(a["maxx"][i], b["maxx"][j]) - max(a["minx"][i], b["minx"][j])
            wy = min(a["maxy"][i], b["maxy"][j]) - max(a["miny"][i], b["miny"][j])
            if wx > 0 and wy > 0:
                out[(int(a["zone_id"][i]), int(b["zone_id"][j]))] = (int(wx), int(wy))
    return out


def test_overlay_matches_brute_force(spark):
    cfg = dg.GoldenConfig(n_rect_zones=70)
    got = {
        (r["zone_a"], r["zone_b"]): (r["inter_w"], r["inter_h"])
        for r in overlay.overlay_rect_join(
            dg.rect_zones_df(spark, cfg), dg.rect_zones_b_df(spark, cfg), level=5
        ).collect()
    }
    assert got == _brute_pairs(dg.rect_zones_np(cfg), dg.rect_zones_b_np(cfg))


def test_overlay_emits_multicell_pairs_exactly_once(spark):
    """A giant rect pair covering many cells must still emit one row, and a
    corner-touching pair (zero area) must emit none."""
    a = spark.createDataFrame(
        [(0, 1000, 1000, 60000, 60000), (1, 0, 0, 500, 500)],
        "zone_id long, minx long, miny long, maxx long, maxy long",
    )
    b = spark.createDataFrame(
        [(10, 2000, 2000, 70000, 70000), (11, 500, 500, 900, 900)],
        "zone_id long, minx long, miny long, maxx long, maxy long",
    )
    rows = overlay.overlay_rect_join(a, b, level=5).collect()
    assert [(r["zone_a"], r["zone_b"], r["inter_area"]) for r in rows] == [
        (0, 10, 58000 * 58000)
    ]


@pytest.mark.parametrize("level", [3, 5, 7])
def test_overlay_level_invariant_random(spark, level):
    """Random layers: result set identical at every bucketing level."""
    rng = np.random.RandomState(42)

    def layer(n, seed_off):
        minx = rng.randint(0, 100000, n)
        miny = rng.randint(0, 100000, n)
        return {
            "zone_id": np.arange(n) + seed_off,
            "minx": minx,
            "miny": miny,
            "maxx": minx + rng.randint(1, 30000, n),
            "maxy": miny + rng.randint(1, 30000, n),
        }

    la, lb = layer(40, 0), layer(40, 1000)
    cols = "zone_id long, minx long, miny long, maxx long, maxy long"
    fa = spark.createDataFrame(list(zip(*(la[c].tolist() for c in la))), cols)
    fb = spark.createDataFrame(list(zip(*(lb[c].tolist() for c in lb))), cols)
    got = {
        (r["zone_a"], r["zone_b"]): (r["inter_w"], r["inter_h"])
        for r in overlay.overlay_rect_join(fa, fb, level=level).collect()
    }
    assert got == _brute_pairs(la, lb)


def test_overlay_plan_no_cartesian_no_dedup(spark):
    cfg = dg.GoldenConfig(n_rect_zones=70)
    out = overlay.overlay_rect_join(
        dg.rect_zones_df(spark, cfg), dg.rect_zones_b_df(spark, cfg)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Deduplicate" not in plan
    # exactly one binary join in the plan, keyed on the cell
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("Join") == 1
    assert "cell" in opt


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rects = st.lists(
    st.tuples(
        st.integers(0, 120000), st.integers(0, 120000),
        st.integers(1, 40000), st.integers(1, 40000),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ra=_rects, rb=_rects, level=st.integers(2, 7))
def test_overlay_property_random_layers(spark, ra, rb, level):
    """Hypothesis: arbitrary rect layers (degenerate overlaps, shared edges,
    containment, off-frame extents) — overlay == brute force at any level.
    NOTE: no function-scoped fixtures besides the session spark (hypothesis
    health check suppressed was the round-3 suite-red lesson — none here)."""
    def layer(rs, off):
        return {
            "zone_id": np.arange(len(rs)) + off,
            "minx": np.array([r[0] for r in rs]),
            "miny": np.array([r[1] for r in rs]),
            "maxx": np.array([r[0] + r[2] for r in rs]),
            "maxy": np.array([r[1] + r[3] for r in rs]),
        }

    la, lb = layer(ra, 0), layer(rb, 10_000)
    cols = "zone_id long, minx long, miny long, maxx long, maxy long"
    fa = spark.createDataFrame(list(zip(*(la[c].tolist() for c in la))), cols)
    fb = spark.createDataFrame(list(zip(*(lb[c].tolist() for c in lb))), cols)
    got = {
        (r["zone_a"], r["zone_b"]): (r["inter_w"], r["inter_h"])
        for r in overlay.overlay_rect_join(fa, fb, level=level).collect()
    }
    assert got == _brute_pairs(la, lb)  # keyed by zone_id values
