"""Polygonize / rasterize: exact kernels + Spark roundtrip."""

import numpy as np
from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import raster_vector as rv


def test_ccl_shapes():
    m = np.zeros((8, 8), dtype=bool)
    m[1:3, 1:3] = True  # square
    m[5:7, 4:8] = True  # bar
    m[0, 7] = True  # lone pixel
    labels, n = rv.connected_components(m)
    assert n == 3
    assert len(np.unique(labels[m])) == 3
    assert (labels[~m] == 0).all()


def test_ccl_u_shape_merges():
    """U-shape: two arms labeled separately then merged by the base."""
    m = np.zeros((6, 6), dtype=bool)
    m[0:5, 1] = True
    m[0:5, 4] = True
    m[4, 1:5] = True
    labels, n = rv.connected_components(m)
    assert n == 1


def test_trace_rings_square():
    m = np.zeros((5, 5), dtype=bool)
    m[1:4, 1:4] = True
    rings = rv.trace_rings(m)
    assert len(rings) == 1
    r = rings[0]
    assert len(r) == 4  # collinear merge → 4 corners
    assert set(map(tuple, r.tolist())) == {(1, 1), (4, 1), (4, 4), (1, 4)}


def test_trace_rings_with_hole():
    m = np.ones((5, 5), dtype=bool)
    m[2, 2] = False
    rings = rv.trace_rings(m)
    assert len(rings) == 2  # outer + hole
    sizes = sorted(len(r) for r in rings)
    assert sizes == [4, 4]


def _roundtrip(m: np.ndarray) -> np.ndarray:
    """rasterize(polygonize(m)) with even-odd ring composition."""
    H, W = m.shape
    labels, n = rv.connected_components(m)
    recon = np.zeros_like(m, dtype=np.uint8)
    for comp in range(1, n + 1):
        acc = np.zeros_like(m, dtype=np.uint8)
        for ring in rv.trace_rings(labels == comp):
            world = np.stack([ring[:, 0].astype(float), -ring[:, 1].astype(float)], axis=1)
            acc ^= rv.rasterize_ring(world, 0.0, 0.0, 1.0, H, W)
        recon |= acc
    return recon.astype(bool)


def test_trace_rings_saddle_corner():
    """Two same-component pixels touching only diagonally (saddle vertex at
    (2,2)): the walk must split the pinch into simple rings, not crash or
    emit a figure-eight. Regression: the single-slot edge dict used to lose
    one of the two outgoing edges and KeyError mid-walk."""
    m = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 0]], dtype=bool)
    rings = rv.trace_rings(m)
    assert len(rings) == 2  # outer (with the (2,2) notch) + hole at (1,1)
    # each ring is simple: no repeated vertices
    for r in rings:
        pts = list(map(tuple, r.tolist()))
        assert len(pts) == len(set(pts))
    # signed-area invariant: |Σ 2A| / 2 == pixel count
    tot = 0
    for r in rings:
        xs, ys = r[:, 0], r[:, 1]
        tot += int((xs * np.roll(ys, -1) - np.roll(xs, -1) * ys).sum())
    assert abs(tot) // 2 == int(m.sum())
    assert np.array_equal(_roundtrip(m), m)


def test_roundtrip_random_pixel_noise_saddle_dense():
    """Per-pixel random masks are dense in saddle vertices and irregular
    holes — the adversarial regime for the ring walk."""
    for seed in range(6):
        rng = np.random.default_rng(seed)
        m = rng.random((16, 16)) < 0.5
        assert np.array_equal(_roundtrip(m), m), f"seed {seed}"


def test_polygonize_rasterize_roundtrip_kernel():
    """rasterize(polygonize(m)) == m with even-odd ring composition."""
    rng = np.random.default_rng(5)
    for _ in range(8):
        m = np.zeros((16, 16), dtype=bool)
        # random rectangles → nontrivial unions/holes
        for _ in range(4):
            r0, c0 = rng.integers(0, 10, 2)
            h, w = rng.integers(2, 6, 2)
            m[r0 : r0 + h, c0 : c0 + w] = True
        labels, n = rv.connected_components(m)
        recon = np.zeros_like(m, dtype=np.uint8)
        for comp in range(1, n + 1):
            cm = labels == comp
            acc = np.zeros_like(m, dtype=np.uint8)
            for ring in rv.trace_rings(cm):
                # pixel-corner ring → world (x0=0, y1=0, px=1, y down → use -1)
                world = np.stack([ring[:, 0].astype(float), -ring[:, 1].astype(float)], axis=1)
                acc ^= rv.rasterize_ring(world, 0.0, 0.0, 1.0, 16, 16)
            recon |= acc
        assert np.array_equal(recon.astype(bool), m)


def test_polygonize_spark_end_to_end(spark):
    cfg = dg.GoldenConfig(n_tiles=4, tile_px=32, n_media_tiles=4)
    media = dg.media_df(spark, cfg)

    def class_of_dn(arr):
        return (arr[0] > 5000).astype(np.int32)  # 2-class threshold on band 0

    polys = rv.polygonize(media, class_of_dn).toPandas()
    assert len(polys) > 0
    # one area per component (ring rows repeat it) — classes tile the raster
    comp = polys.drop_duplicates(["media_ref", "class", "component"])
    assert (comp.groupby("media_ref").area_px.sum() == 32 * 32).all()
    assert polys.wkt.str.startswith("POLYGON ((").all()


def test_rasterize_zones_spark(spark):
    cfg = dg.GoldenConfig(n_tiles=40, tile_px=32, n_media_tiles=0)
    tiles = dg.tiles_df(spark, cfg)
    meta = tiles.select(
        "media_ref", "x0", "y1",
        F.lit(32).alias("width"), F.lit(32).alias("height"),
        F.lit(10.0).alias("px"),
    )
    polys = dg.poly_zones_df(spark, cfg)
    # candidates: bbox overlap tile×zone (small scale: cross-join filter)
    zb = polys.select(
        "zone_id",
        F.expr("aggregate(ring, cast('inf' as double), (a, p) -> least(a, p.x))").alias("zminx"),
        F.expr("aggregate(ring, cast('-inf' as double), (a, p) -> greatest(a, p.x))").alias("zmaxx"),
        F.expr("aggregate(ring, cast('inf' as double), (a, p) -> least(a, p.y))").alias("zminy"),
        F.expr("aggregate(ring, cast('-inf' as double), (a, p) -> greatest(a, p.y))").alias("zmaxy"),
    )
    cand = (
        tiles.crossJoin(F.broadcast(zb))
        .filter((F.col("x0") <= F.col("zmaxx")) & (F.col("x1") >= F.col("zminx"))
                & (F.col("y0") <= F.col("zmaxy")) & (F.col("y1") >= F.col("zminy")))
        .select("media_ref", "zone_id")
    )
    out = rv.rasterize_zones(meta, polys, cand).toPandas()
    assert len(out) == cand.count()
    assert (out.n_inside >= 0).all() and out.n_inside.max() > 0
    m = np.frombuffer(out.iloc[0]["mask"], dtype=np.uint8)
    assert m.size == 32 * 32
