"""Deterministic integer PageRank (fixed-iteration, shuffle-bounded).

Classic damped PageRank re-expressed so every engine computes bit-identical
ranks — the same exactness discipline as the engine's k-means and
connected-components operators (operators/kmeans.py, operators/dedup_cc.py):

* ranks are INTEGERS scaled by ``scale`` (default 10⁶); rank₀ = scale;
* every division is integer floor division (``div``/``//``) — no float in
  the dataflow, so results are independent of partitioning and join order;
* per iteration:  contrib(edge u→v) = rank(u) div outdeg(u);
  rank'(v) = (den−num)·scale div den  +  num · Σ contrib(·→v) div den
  (num/den = 85/100 damping); multi-edges each contribute, self-loops
  allowed, dangling mass is dropped (the classic simplified formulation —
  all three choices pinned for oracle parity).

Scale shape per iteration: ONE join of ranks onto the degree-annotated edge
list keyed by src (both sides can be pre-partitioned/bucketed by src, so at
100 TB the edge exchange is paid once and reused every iteration) + ONE
map-combined aggregate keyed by dst. No driver-side collect of anything
node- or edge-sized; lineage grows linearly with the (small, fixed)
iteration count — for long runs pass ``checkpoint_every`` to truncate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    n_nodes: int,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` exact integer PageRank iterations over
    ``edges`` (src, dst) on the node domain [0, n_nodes)."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0; got {iters}")
    if not (0 < damping_num < damping_den):
        raise ValueError(f"need 0 < num < den; got {damping_num}/{damping_den}")

    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("odeg"))
    ed = edges.join(outdeg, "src").select("src", "dst", "odeg")
    base = (damping_den - damping_num) * scale // damping_den

    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    for i in range(iters):
        inc = (
            ed.join(ranks, ed.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("rank div odeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
