"""Exact distributed DBSCAN (operators/dbscan.py) — brute-force parity,
property sweep, and plan shape.

The brute-force reference below recomputes textbook DBSCAN (core =
|N_eps(p)| >= min_pts counting p itself; clusters = connected components
of the core–core ε-graph labeled by min core id; border = min cluster of
core ε-neighbors, the engine's documented deterministic tie-break;
everything else noise) with plain numpy + BFS — fully independent of the
operator's grid join and star-contraction CC.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import dbscan


def _brute_dbscan(ids, xs, ys, eps, min_pts):
    n = len(ids)
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    d2 = (xs[:, None] - xs[None, :]) ** 2 + (ys[:, None] - ys[None, :]) ** 2
    nb = d2 <= eps * eps  # includes self (diagonal is 0)
    core = nb.sum(axis=1) >= min_pts
    lab = {}
    # components of the core-core graph via BFS, labeled by min core id
    seen = np.zeros(n, dtype=bool)
    for s in range(n):
        if not core[s] or seen[s]:
            continue
        comp, stack = [], [s]
        seen[s] = True
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.where(nb[u] & core & ~seen)[0]:
                seen[v] = True
                stack.append(int(v))
        rep = min(int(ids[i]) for i in comp)
        for i in comp:
            lab[int(ids[i])] = ("core", rep)
    for i in range(n):
        if core[i]:
            continue
        cn = [lab[int(ids[j])][1] for j in np.where(nb[i] & core)[0]]
        lab[int(ids[i])] = ("border", min(cn)) if cn else ("noise", -1)
    return lab


def _run(spark, ids, xs, ys, eps, min_pts, **kw):
    df = spark.createDataFrame(
        list(zip(map(int, ids), map(int, xs), map(int, ys))),
        "q_id long, qx long, qy long",
    )
    out = dbscan.dbscan(df, eps=eps, min_pts=min_pts, **kw)
    return {r["q_id"]: (r["role"], r["cluster_id"]) for r in out.collect()}


def test_dbscan_golden_corpus_matches_brute_force(spark):
    p = dg.points_np(dg.GoldenConfig(n_points=300))
    got = _run(spark, p["q_id"], p["qx"], p["qy"], eps=6000, min_pts=6)
    assert got == _brute_dbscan(p["q_id"], p["qx"], p["qy"], 6000, 6)
    roles = {v[0] for v in got.values()}
    assert roles == {"core", "border", "noise"}  # all three paths exercised


def test_dbscan_min_pts_one_every_point_is_core(spark):
    # min_pts=1: the self-pair makes every point core; isolated points
    # become singleton clusters labeled by their own id (nodes= path in CC)
    ids, xs, ys = [7, 9, 50], [0, 100, 90000], [0, 0, 90000]
    got = _run(spark, ids, xs, ys, eps=500, min_pts=1)
    assert got == {7: ("core", 7), 9: ("core", 7), 50: ("core", 50)}


def test_dbscan_all_noise(spark):
    ids, xs, ys = [1, 2, 3], [0, 50000, 100000], [0, 50000, 100000]
    got = _run(spark, ids, xs, ys, eps=10, min_pts=2)
    assert got == {1: ("noise", -1), 2: ("noise", -1), 3: ("noise", -1)}


def test_dbscan_border_min_rule_tie(spark):
    # one border point equidistant from two different clusters: the
    # min-rule must pick the smaller cluster id deterministically
    ids = [0, 1, 10, 11, 5]
    xs = [0, 0, 2000, 2000, 1000]
    ys = [0, 10, 0, 10, 0]
    got = _run(spark, ids, xs, ys, eps=1100, min_pts=3)
    # clusters {0,1} and {10,11} (cores via the center point? no: the
    # center is within 1100 of all four, giving everyone degree >= 3)
    assert got == _brute_dbscan(ids, xs, ys, 1100, 3)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 50000), st.integers(0, 50000)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    eps=st.sampled_from([800, 3000, 9000]),
    min_pts=st.integers(1, 5),
)
def test_dbscan_property_random_points(spark, pts, eps, min_pts):
    ids = list(range(len(pts)))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    got = _run(spark, ids, xs, ys, eps=eps, min_pts=min_pts)
    assert got == _brute_dbscan(ids, xs, ys, eps, min_pts)


def test_dbscan_plan_no_cartesian(spark):
    df = dg.points_df(spark, dg.GoldenConfig(n_points=200))
    out = dbscan.dbscan(df, eps=6000, min_pts=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dbscan_tiny_eps_fallback_path(spark):
    # eps < sqrt(2): no integer grid cell satisfies the clique invariant,
    # so the raw core-core edge path runs. Distance-1 chain: 0-1-2 all core
    # at min_pts=2; the isolated point is noise.
    ids, xs, ys = [0, 1, 2, 9], [0, 1, 2, 100], [0, 0, 0, 100]
    got = _run(spark, ids, xs, ys, eps=1, min_pts=2)
    assert got == {0: ("core", 0), 1: ("core", 0), 2: ("core", 0), 9: ("noise", -1)}
    assert got == _brute_dbscan(ids, xs, ys, 1, 2)


def test_dbscan_distributed_cc_fallback_matches_driver_uf(spark):
    # max_driver_cells=0 forces the distributed star-contraction path;
    # results must be identical to the default driver union-find path
    p = dg.points_np(dg.GoldenConfig(n_points=250))
    ids, xs, ys = p["q_id"], p["qx"], p["qy"]
    got_dist = _run(spark, ids, xs, ys, eps=6000, min_pts=5, max_driver_cells=0)
    got_uf = _run(spark, ids, xs, ys, eps=6000, min_pts=5)
    want = _brute_dbscan(ids, xs, ys, 6000, 5)
    assert got_uf == want
    assert got_dist == want
