"""Distributed Lloyd's k-means over int64-quantized embeddings.

The scalable shape is the textbook one: per iteration, assignment is a
map-only pass with the centroids broadcast (k·dim longs — bytes, not data),
and the update is a map-side-combined partial aggregation down to k·dim
rows. The driver only ever holds k·dim integers; the corpus is scanned once
per iteration from a persisted quantized projection. Nothing here sorts,
windows, or collects the fact side.

Exactness discipline (same as operators/similarity.py): vectors are quantized
to the int64 lattice round(x·10⁶) up front, every distance / dot product is
exact int64 arithmetic, and the centroid update is the exact integer
``floor(sum / count)`` per coordinate (numpy ``floor_divide`` on int64 —
true floor, matching the oracle's ``floor(CAST(sum AS DOUBLE)/count)``,
which is exact while |sum| < 2⁵² and count ≪ ulp⁻¹ away from integers).
So a 1000-executor run assigns every vector to the same centroid as the
single-threaded oracle, iteration by iteration.

Determinism pins:
* init — centroid j is the vector with vec_id == j·(n // k) (ids are dense
  in the synthetic corpora; any deterministic id set works);
* argmin ties — lowest cluster id wins;
* empty clusters — keep the previous centroid (mirrored by the oracle).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_K = 4096  # driver holds k·dim longs; 4096×64 ≈ 2 MB — a config bound,
# not a scale bound (the corpus side never depends on k beyond the broadcast)

ASSIGN_SCHEMA = "vec_id long, cluster int, dist_sq long"
_PARTIAL_SCHEMA = "cluster int, i int, psum long, pcnt long"


def _assign_np(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact argmin over clusters: returns (cluster ids, squared distances).

    argmin of ||q−c||² over c ⇔ argmin of (c·c − 2 q·c); both are exact
    int64. Ties resolve to the lowest cluster id (np.argmin convention).
    """
    c_n2 = (cents * cents).sum(axis=1)  # (k,)
    dots = q @ cents.T  # (B, k) int64 exact
    score = c_n2[None, :] - 2 * dots
    cl = np.argmin(score, axis=1)
    q_n2 = (q * q).sum(axis=1)
    d2 = q_n2 + score[np.arange(len(q)), cl]
    return cl.astype(np.int64), d2


def lloyd_kmeans(
    qv: DataFrame, k: int, iters: int, dim: int
) -> tuple[DataFrame, np.ndarray]:
    """Run ``iters`` Lloyd iterations; return (assignment DF, final centroids).

    ``qv`` is (vec_id long, q array<long>) from ``similarity.quantize``-style
    projection. ``vec_id`` must be EXACTLY the dense range 0..n−1: the
    deterministic seed rule (every ``n // k``-th id) and its SQL-oracle
    mirror both index into that range — validated up front with a clear
    error rather than a mid-run KeyError. The assignment DataFrame is
    (vec_id, cluster, dist_sq) against the FINAL centroids, fully
    deterministic.
    """
    import pandas as pd

    if not (1 <= k <= MAX_K):
        raise ValueError(f"k must be in [1, {MAX_K}]; got {k}")
    qv = qv.select("vec_id", "q").persist()
    try:
        n, mn, mx, nd = qv.agg(
            F.count("*"), F.min("vec_id"), F.max("vec_id"), F.countDistinct("vec_id")
        ).first()
        if n < k:
            raise ValueError(f"need at least k={k} vectors; got {n}")
        if mn != 0 or mx != n - 1 or nd != n:
            raise ValueError(
                f"vec_id must be the dense range 0..{n - 1} (seed rule + SQL "
                f"oracle index into it); got min={mn} max={mx} distinct={nd}"
            )
    except BaseException:
        # validation failed AFTER the persist was registered + materialized
        # by the agg: release the corpus-sized blocks so a caller retrying
        # with corrected input doesn't leak them for the session's lifetime
        qv.unpersist()
        raise
    stride = n // k
    seed_ids = [j * stride for j in range(k)]
    seeds = {
        int(r["vec_id"]): r["q"]
        for r in qv.filter(F.col("vec_id").isin(seed_ids)).collect()
    }
    cents = np.array([seeds[i] for i in seed_ids], dtype=np.int64)

    def partials_for(cents_arr: np.ndarray):
        def run(it):
            for pdf in it:
                q = np.array(pdf["q"].tolist(), dtype=np.int64)
                cl, _ = _assign_np(q, cents_arr)
                sums = np.zeros((k, dim), dtype=np.int64)
                cnts = np.zeros(k, dtype=np.int64)
                np.add.at(sums, cl, q)
                np.add.at(cnts, cl, 1)
                nz = np.nonzero(cnts)[0]
                yield pd.DataFrame(
                    {
                        "cluster": np.repeat(nz, dim),
                        "i": np.tile(np.arange(dim), len(nz)),
                        "psum": sums[nz].ravel(),
                        "pcnt": np.repeat(cnts[nz], dim),
                    }
                )

        return run

    for _ in range(iters):
        rows = (
            qv.mapInPandas(partials_for(cents), _PARTIAL_SCHEMA)
            .groupBy("cluster", "i")
            .agg(F.sum("psum").alias("s"), F.sum("pcnt").alias("c"))
            .collect()
        )
        nxt = cents.copy()  # empty cluster ⇒ previous centroid survives
        sums = np.zeros((k, dim), dtype=np.int64)
        cnts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"], r["i"]] = r["s"]
            cnts[r["cluster"]] = r["c"]
        occupied = cnts > 0
        nxt[occupied] = np.floor_divide(sums[occupied], cnts[occupied, None])
        cents = nxt

    final = cents

    def assign(it):
        for pdf in it:
            q = np.array(pdf["q"].tolist(), dtype=np.int64)
            cl, d2 = _assign_np(q, final)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cluster": cl, "dist_sq": d2}
            )

    # materialize the (small) assignment, then release the persisted input —
    # callers get a plain frame with no cache-manager obligations (the same
    # footgun knn_join had to fix; see operators/knn.py:104-123)
    out = qv.mapInPandas(assign, ASSIGN_SCHEMA).localCheckpoint(eager=True)
    qv.unpersist()
    return out, final
