"""Fixed-point IDW (operators/interpolate.py) — brute-force parity,
exact-hit rule, NULL-outside-coverage, plan shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import interpolate


def _brute(queries, obs, radius, scale=interpolate.IDW_SCALE):
    out = {}
    for qid, qx, qy in queries:
        hits, swv, sw, n = [], 0, 0, 0
        for ox, oy, v, oid in obs:
            d2 = (qx - ox) ** 2 + (qy - oy) ** 2
            if d2 > radius * radius:
                continue
            n += 1
            if d2 == 0:
                hits.append((oid, v))
            else:
                w = scale // d2
                swv += w * v
                sw += w
        if hits:
            est = min(hits)[1]
        elif sw > 0:
            est = swv // sw
        else:
            est = None
        out[qid] = (n, est)
    return out


def _run(spark, queries, obs, radius):
    q = spark.createDataFrame(queries, "q_id long, qx long, qy long")
    o = spark.createDataFrame(obs, "cx long, cy long, v long, obs_id long")
    got = interpolate.idw(q, o, radius=radius, oid="obs_id").collect()
    return {r["q_id"]: (r["n_obs"], r["est"]) for r in got}


def test_idw_golden_corpus_matches_brute_force(spark):
    cfg = dg.GoldenConfig(n_tiles=400, n_points=150)
    t, p = dg.tiles_np(cfg), dg.points_np(cfg)
    v = dg.ihash_np(t["tile_k"], 41) % 10000
    obs = list(zip(t["cx"].tolist(), t["cy"].tolist(), v.tolist(), t["tile_k"].tolist()))
    queries = list(zip(p["q_id"].tolist(), p["qx"].tolist(), p["qy"].tolist()))
    got = _run(spark, queries, obs, radius=6000)
    want = _brute(queries, obs, 6000)
    assert got == want
    assert any(est is None for _, est in got.values())  # far margin exercised


def test_idw_exact_hit_shortcircuits_with_min_id_tiebreak(spark):
    # two observations exactly ON the query point with different values:
    # the min-obs_id one wins, and nearby non-hit obs are ignored
    obs = [(10, 10, 777, 5), (10, 10, 111, 2), (11, 10, 9999, 9)]
    got = _run(spark, [(1, 10, 10)], obs, radius=100)
    assert got == {1: (3, 111)}


def test_idw_no_neighbor_null(spark):
    got = _run(spark, [(1, 0, 0), (2, 50000, 50000)], [(50100, 50000, 42, 0)], radius=500)
    assert got == {1: (0, None), 2: (1, 42)}


def test_idw_weights_follow_inverse_square(spark):
    # one obs at d=1 (w=SCALE), one at d=2 (w=SCALE//4): est is the
    # integer-weighted mean, biased toward the closer value
    obs = [(1, 0, 100, 0), (0, 2, 600, 1)]
    got = _run(spark, [(7, 0, 0)], obs, radius=10)
    s = interpolate.IDW_SCALE
    want = (s * 100 + (s // 4) * 600) // (s + s // 4)
    assert got == {7: (2, want)}


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    qpts=st.lists(st.tuples(st.integers(0, 2000), st.integers(0, 2000)), min_size=1, max_size=12),
    opts=st.lists(
        st.tuples(
            st.integers(0, 2000), st.integers(0, 2000), st.integers(0, 9999)
        ),
        min_size=1,
        max_size=25,
    ),
    radius=st.sampled_from([150, 800]),
)
def test_idw_property_random_layouts(spark, qpts, opts, radius):
    queries = [(i, x, y) for i, (x, y) in enumerate(qpts)]
    obs = [(x, y, v, j) for j, (x, y, v) in enumerate(opts)]
    assert _run(spark, queries, obs, radius) == _brute(queries, obs, radius)


def test_idw_plan_no_cartesian(spark):
    cfg = dg.GoldenConfig(n_tiles=200, n_points=50)
    obs = dg.tiles_df(spark, cfg).select(
        "cx", "cy", (dg.ihash_col(F.col("tile_k"), 41) % 10000).alias("v")
    )
    out = interpolate.idw(dg.points_df(spark, cfg), obs, radius=6000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
