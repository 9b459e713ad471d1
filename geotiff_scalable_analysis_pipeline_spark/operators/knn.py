"""Cell-bucketed kNN join via ring expansion (SURVEY.md §2.4 J5).

For each query point, the k nearest tile centroids. Spark-first design:

* targets are bucketed by level-L quad cell once (small broadcastable table
  at golden scale; at 100 TB it is the cell-partitioned tiles table and the
  same plan holds with a shuffle hash join on ``cell``);
* each round, *unfinished* queries explode the Chebyshev disk of lattice
  radius r around their own cell (pure Catalyst ``sequence()`` × 2) and
  equi-join targets on ``cell``;
* a query finishes when it has ≥k candidates with kth distance ≤ r·res —
  any target outside disk(r) lies at Euclidean distance ≥ r·res, so the
  result is provably exact (no approximation);
* radius grows geometrically per round; stragglers (queries in empty space)
  keep expanding until their disk provably covers the lattice — candidate
  volume stays proximity-bounded, never an all-pairs crossJoin.

Determinism: distances are exact integer squares; ties broken by
``media_ref`` ascending — bit-identical to the DuckDB brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cells import cell_res, morton_col

DEFAULT_LEVEL = 5


def _with_lattice(df: DataFrame, x: str, y: str, level: int) -> DataFrame:
    res = cell_res(level)
    n = (1 << level) - 1

    def lat(c):
        return F.greatest(
            F.lit(0), F.least(F.lit(n), F.floor(F.col(c) / F.lit(res)).cast("long"))
        )

    return df.withColumn("_qix", lat(x)).withColumn("_qiy", lat(y))


def pick_level(n_targets: int) -> int:
    """Bucket level targeting ~6 targets/cell over the frame:
    cells(L) ≈ (0.763·2^L)² ⇒ L = log4(n/3.5), clamped to [3, 9].

    The cap matters at scale: round-1 candidate volume per query is
    ≈ (2·r0+1)² × targets/cell, so density must stay O(k) — but each extra
    level also doubles lattice resolution, and the finish test
    ``kth_dist ≤ r·res`` passes less often → straggler ring rounds
    (measured: 500 k queries × 2 M targets at level 10 ran 17+ min at
    local[8]; level 9 with r0=1 runs in tens of seconds)."""
    import math

    if n_targets < 8:
        return 3
    return max(3, min(9, round(math.log(n_targets / 3.5, 4))))


def knn_join(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    level: int | None = None,
    x: str = "qx",
    y: str = "qy",
    tx: str = "cx",
    ty: str = "cy",
    target_id: str = "media_ref",
    initial_radius: int = 1,
    radius_growth: int = 4,
) -> DataFrame:
    """Exact kNN: (q_id, rank, <target_id>, dist_sq), rank 1..k.

    ``level=None`` auto-sizes the cell grid from the target count so the
    per-query candidate set stays O(k) regardless of scale.
    """
    if level is None:
        level = pick_level(targets.count())
    res = cell_res(level)
    n = (1 << level) - 1

    # target cell key = raw Morton code at `level` (single level → no suffix)
    tgt = targets.select(
        F.col(target_id),
        F.col(tx).cast("long").alias("_tx"),
        F.col(ty).cast("long").alias("_ty"),
    )
    tgt = tgt.withColumn(
        "_tcell",
        morton_col(
            F.greatest(F.lit(0), F.least(F.lit(n), F.floor(F.col("_tx") / F.lit(res)).cast("long"))),
            F.greatest(F.lit(0), F.least(F.lit(n), F.floor(F.col("_ty") / F.lit(res)).cast("long"))),
            level,
        ),
    )
    tgt = tgt.persist()

    remaining = _with_lattice(queries.select("q_id", x, y), x, y, level).persist()
    finished: list[DataFrame] = []
    w = Window.partitionBy("q_id").orderBy("dist_sq", target_id)

    # radius doubles until the disk provably covers the whole lattice —
    # candidates stay proximity-bounded (no all-pairs crossJoin ever: a
    # straggler in empty space joins only the cells within its ring, which is
    # exactly the tiles within ~r·res of it).
    r = initial_radius
    while True:
        covers_all = r >= (1 << level)
        disk = (
            remaining.withColumn("_dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("_dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("_cix", F.col("_qix") + F.col("_dx"))
            .withColumn("_ciy", F.col("_qiy") + F.col("_dy"))
            .filter(
                (F.col("_cix") >= 0) & (F.col("_cix") <= n) & (F.col("_ciy") >= 0) & (F.col("_ciy") <= n)
            )
            .withColumn("_tcell", morton_col(F.col("_cix"), F.col("_ciy"), level))
        )
        # shuffle-hash, not broadcast: rebuilding a broadcast of the target
        # table every round serializes on the driver; a shuffle of the
        # (persisted) targets parallelizes and AQE handles skewed cells
        cand = disk.join(tgt.hint("shuffle_hash"), "_tcell")

        scored = cand.withColumn(
            "dist_sq",
            (F.col(x).cast("long") - F.col("_tx")) * (F.col(x).cast("long") - F.col("_tx"))
            + (F.col(y).cast("long") - F.col("_ty")) * (F.col(y).cast("long") - F.col("_ty")),
        )
        topk = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", target_id, "dist_sq")
        )
        if covers_all:
            finished.append(topk)
            break

        # persist the round's topk: the per-round isEmpty() barrier
        # materializes it into cache, so the final union action reads the
        # cache instead of re-running the candidate join (the join is the
        # round's dominant cost — this halves round-1 work at bench scale)
        topk = topk.persist()

        # a query is final iff it has k hits and the kth is ≤ r*res (any
        # target outside disk(r) is at distance ≥ r*res)
        bound = float(r * res) ** 2
        per_q = topk.groupBy("q_id").agg(
            F.count("*").alias("_cnt"), F.max("dist_sq").alias("_kth")
        )
        done_q = per_q.filter((F.col("_cnt") == k) & (F.col("_kth") <= bound)).select("q_id")
        finished.append(topk.join(F.broadcast(done_q), "q_id"))
        remaining = remaining.join(F.broadcast(done_q), "q_id", "left_anti").persist()
        if remaining.isEmpty():
            break
        # ×4 growth measured fastest end-to-end (3s vs 14.5s for ×2 at 10×
        # bench scale, 2 cores): rounds are driver-synchronized barriers, so
        # fewer rounds beats tighter disks; eager per-round checkpointing
        # measured ~10× slower than lazy persists (materialization blocks the
        # round pipeline). Straggler-round volume is bounded by giving the
        # driver enough heap (see BENCH/run_scaling.py SPARK_DRIVER_MEM).
        r *= radius_growth

    out = finished[0]
    for f in finished[1:]:
        out = out.unionByName(f)
    return out
