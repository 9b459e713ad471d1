"""Lloyd's k-means vs an independent numpy reference implementation.

The reference implements the pinned semantics directly (stride seeds,
int64 distances, lowest-cluster tie-break, floor(sum/count) update, empty
cluster keeps previous centroid) with none of the distributed machinery.
"""

import numpy as np
import pandas as pd
import pytest

from geotiff_scalable_analysis_pipeline_spark.operators import kmeans


def _ref_lloyd(q: np.ndarray, k: int, iters: int):
    n = len(q)
    stride = n // k
    cents = q[np.arange(k) * stride].copy()
    for _ in range(iters):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)  # argmin → lowest index on ties
        nxt = cents.copy()
        for j in range(k):
            m = cl == j
            if m.any():
                nxt[j] = np.floor_divide(q[m].sum(axis=0), m.sum())
        cents = nxt
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    return cl, d2[np.arange(n), cl], cents


def _spark_qv(spark, q: np.ndarray):
    return spark.createDataFrame(
        [(i, [int(x) for x in row]) for i, row in enumerate(q)],
        "vec_id long, q array<long>",
    )


def _check(spark, q: np.ndarray, k: int, iters: int):
    out, cents = kmeans.lloyd_kmeans(_spark_qv(spark, q), k, iters, dim=q.shape[1])
    got = out.toPandas().sort_values("vec_id").reset_index(drop=True)
    cl, d2, ref_cents = _ref_lloyd(q, k, iters)
    np.testing.assert_array_equal(cents, ref_cents)
    pd.testing.assert_frame_equal(
        got.astype({"cluster": "int64"}),
        pd.DataFrame(
            {"vec_id": np.arange(len(q)), "cluster": cl, "dist_sq": d2}
        ).astype({"vec_id": "int64", "cluster": "int64", "dist_sq": "int64"}),
    )


def test_kmeans_random_matches_reference(spark):
    rng = np.random.default_rng(7)
    q = rng.integers(-500_000, 500_000, size=(120, 16)).astype(np.int64)
    _check(spark, q, k=5, iters=3)


def test_kmeans_clustered_data_negative_coords(spark):
    """Well-separated blobs incl. negative coordinates (floor ≠ trunc)."""
    rng = np.random.default_rng(3)
    centers = rng.integers(-400_000, 400_000, size=(4, 8))
    q = np.concatenate(
        [c + rng.integers(-999, 1000, size=(30, 8)) for c in centers]
    ).astype(np.int64)
    rng.shuffle(q)
    _check(spark, q, k=4, iters=4)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """Two far blobs, k=3: the stride seeds put two seeds in one blob; after
    the first update at least one cluster can starve — the pinned rule is
    that a starved cluster's centroid survives unchanged."""
    q = np.concatenate(
        [
            np.full((10, 4), 0, dtype=np.int64),
            np.full((10, 4), 1_000_000, dtype=np.int64),
        ]
    )
    _check(spark, q, k=3, iters=3)


def test_kmeans_duplicate_points_tie_break(spark):
    """All-identical vectors: every distance ties; lowest cluster wins."""
    q = np.full((12, 4), 42_000, dtype=np.int64)
    _check(spark, q, k=3, iters=2)


def test_kmeans_result_is_plain_uncached_frame(spark):
    """No cache-manager obligations leak to the caller (knn footgun class):
    the returned frame is materialized and the input is unpersisted."""
    q = np.arange(80, dtype=np.int64).reshape(20, 4) * 1000
    out, _ = kmeans.lloyd_kmeans(_spark_qv(spark, q), 2, 2, dim=4)
    assert out.storageLevel.useMemory is False
    assert out.count() == 20
    jsc = spark.sparkContext._jsc.sc()
    cached = jsc.getPersistentRDDs()
    assert cached.isEmpty() or all(
        "kmeans" not in str(v) for v in [cached]
    )  # persisted input released


def test_kmeans_rejects_bad_k(spark):
    q = np.zeros((5, 4), dtype=np.int64)
    with pytest.raises(ValueError, match="k must be"):
        kmeans.lloyd_kmeans(_spark_qv(spark, q), 0, 1, dim=4)
    with pytest.raises(ValueError, match="at least k"):
        kmeans.lloyd_kmeans(_spark_qv(spark, q), 6, 1, dim=4)


def test_kmeans_rejects_non_dense_vec_ids(spark):
    """The deterministic seed rule (and its SQL-oracle mirror) index into
    the dense range 0..n−1; offset or gapped ids must fail with a clear
    error instead of a mid-run KeyError or silent mis-seeding."""
    q = np.arange(40, dtype=np.int64).reshape(10, 4) * 1000
    offset = spark.createDataFrame(
        [(i + 100, [int(x) for x in row]) for i, row in enumerate(q)],
        "vec_id long, q array<long>",
    )
    with pytest.raises(ValueError, match="dense range"):
        kmeans.lloyd_kmeans(offset, 2, 1, dim=4)
    dup = spark.createDataFrame(
        [(min(i, 8), [int(x) for x in row]) for i, row in enumerate(q)],
        "vec_id long, q array<long>",
    )
    with pytest.raises(ValueError, match="dense range"):
        kmeans.lloyd_kmeans(dup, 2, 1, dim=4)
