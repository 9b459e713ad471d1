"""Triangle counting (operators/triangles.py) — brute-force parity on
random multigraphs, known complete graphs, self-loop/duplicate/orientation
invariance, and the no-cartesian plan shape."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark.operators import triangles


def _brute(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    counts: dict[int, int] = {}
    for u, v, w in combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangles.triangle_counts(df).collect()
    return {r["node"]: r["n_triangles"] for r in rows}


edges_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=60
)


@settings(max_examples=12, deadline=None)
@given(edges=edges_st)
def test_triangles_match_brute_force(spark, edges):
    assert _run(spark, edges) == _brute(edges)


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert _run(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_self_loops_duplicates_and_reversals_are_inert(spark):
    base = [(0, 1), (1, 2), (0, 2)]
    noisy = base + [(1, 0), (2, 1), (0, 0), (1, 1), (0, 1), (0, 1), (2, 0)]
    assert _run(spark, noisy) == _run(spark, base) == {0: 1, 1: 1, 2: 1}


def test_triangle_free_graph_is_empty(spark):
    # star graph: hub with 5 leaves, no closures
    star = [(0, i) for i in range(1, 6)]
    assert _run(spark, star) == {}


def test_max_id_hint_parity_and_elides_rank_base_scan(spark):
    # same answer with the literal rank base, and the plan loses the 1-row
    # kdim aggregate's tag join entirely (one fewer scan + broadcast on the
    # critical path — the point of the hint)
    edges = [(a, b) for a, b in combinations(range(6), 2)] + [(0, 1), (5, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    hinted = triangles.triangle_counts(df, max_id=5)
    assert {r["node"]: r["n_triangles"] for r in hinted.collect()} == _brute(edges)
    plan = hinted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


@settings(max_examples=6, deadline=None)
@given(edges=edges_st, splits=st.integers(2, 4))
def test_close_splits_parity(spark, edges, splits):
    # the R-way branch split is a pure execution strategy: identical result
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangles.triangle_counts(df, close_splits=splits).collect()
    }
    assert got == _brute(edges)


def test_close_splits_plan_has_r_semi_joins(spark):
    df = spark.range(300).select(
        (F.col("id") * 7 % 60).alias("src"), (F.col("id") * 13 % 60).alias("dst")
    )
    plan = (
        triangles.triangle_counts(df, close_splits=3, max_id=59)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LeftSemi") == 3
    assert "CartesianProduct" not in plan


def _brute_coeff(edges):
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri = _brute(edges)
    out = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        if d >= 2:
            t = tri.get(n, 0)
            out[n] = (t, d, (2 * t) / (d * (d - 1)))
    return out


@settings(max_examples=8, deadline=None)
@given(edges=edges_st)
def test_clustering_coefficient_matches_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = triangles.clustering_coefficient(df).collect()
    got = {r["node"]: (r["n_triangles"], r["degree"], r["coeff"]) for r in rows}
    # float equality is EXACT here: one IEEE division of exact integers
    assert got == _brute_coeff(edges)


def test_plan_has_no_cartesian(spark):
    df = spark.range(200).select(
        (F.col("id") * 7 % 40).alias("src"), (F.col("id") * 13 % 40).alias("dst")
    )
    plan = (
        triangles.triangle_counts(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the tolerated nested-loop joins are the broadcasts of the 1-row
    # rank-base aggregate (kdim) — 1×N tag joins (one per consumer of
    # `oriented`), not pair explosions
    assert plan.count("BroadcastNestedLoopJoin") <= 3
