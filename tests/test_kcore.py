"""k-core decomposition (operators/kcore.py) — brute-force peel parity on
random multigraphs, cascade/empty-core/trivial-k edges, and the driver
query's oracle-unroll convergence pin."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark.operators import kcore


def _brute(edges, k):
    """Reference peel: (node -> within-core degree) of the k-core."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    while True:
        nxt = {n for n in alive if len(adj[n] & alive) >= k}
        if nxt == alive:
            break
        alive = nxt
    return {n: len(adj[n] & alive) for n in alive}


def _run(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["deg"] for r in kcore.k_core(df, k=k).collect()}


edges_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=1, max_size=70
)


@settings(max_examples=10, deadline=None)
@given(edges=edges_st, k=st.integers(1, 5))
def test_kcore_matches_brute_force(spark, edges, k):
    assert _run(spark, edges, k) == _brute(edges, k)


def test_cascading_peel(spark):
    # triangle with a pendant chain: the 2-core is exactly the triangle,
    # and removing the chain cascades one node per round (3 rounds)
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    assert _run(spark, edges, 2) == {0: 2, 1: 2, 2: 2}


def test_core_can_be_empty(spark):
    # a tree has no 2-core
    tree = [(0, 1), (0, 2), (1, 3), (1, 4)]
    assert _run(spark, tree, 2) == {}


def test_k1_is_nonisolated_nodes_and_loops_dupes_inert(spark):
    noisy = [(0, 1), (1, 0), (0, 0), (2, 2), (1, 2), (1, 2)]
    # nodes 0,1,2 survive (self-loop-only node 2? no — (1,2) connects it)
    assert _run(spark, noisy, 1) == {0: 1, 1: 2, 2: 1}


def test_invalid_k_rejected(spark):
    import pytest

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore.k_core(df, k=0)


def test_driver_graph_converges_inside_oracle_unroll():
    """The kcore_membership oracle unrolls _KCORE_UNROLL peel rounds; the
    device is only exact if the driver graph's peel reaches its fixpoint
    within that many rounds (extra rounds are then no-ops). Pin it with
    the reference peel over the SAME DuckDB-generated edge list."""
    import duckdb

    from geotiff_scalable_analysis_pipeline_spark import datagen as dg
    from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
        _KCORE_K,
        _KCORE_UNROLL,
        _PR_NODES,
    )

    con = duckdb.connect()
    edges = con.execute(
        "WITH " + dg.graph_edges_sql(_PR_NODES).strip() + " SELECT src, dst FROM gedges"
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = {n for n in adj if len(adj[n]) >= _KCORE_K}  # oracle's alive0
    rounds = 0
    while True:
        nxt = {n for n in alive if len(adj[n] & alive) >= _KCORE_K}
        if nxt == alive:
            break
        alive = nxt
        rounds += 1
    assert rounds <= _KCORE_UNROLL, (rounds, _KCORE_UNROLL)
    assert alive, "driver k must give a non-empty core to be a meaningful query"
