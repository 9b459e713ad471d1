"""Exact distributed DBSCAN over integer point layers.

Spatial clustering is the missing member of the engine's spatial-join
family (PIP `pip_join.py`, kNN `knn.py`, ε-distance `distance_join.py`,
overlay `overlay.py`): given points and (eps, min_pts), label every point
``core`` / ``border`` / ``noise`` and assign density-connected cluster
ids. The reference pipeline has no clustering operator; this belongs to
the training-data-pipeline surface (spatial dedup / region discovery)
the brief asks for beyond SURVEY §2.

Spark-first decomposition — every stage is an existing scale-proven
primitive, no new shuffle shapes:

1. **ε-neighborhood pairs** via the grid-partitioned
   :func:`distance_join` self-join (one ≤9× explode + one cell-keyed
   hash join; never a CartesianProduct). Self-pairs (dist 0) are kept so
   the degree count matches the textbook |N_eps(p)| which includes p.
2. **Core predicate**: one map-combined ``groupBy(q_id).count()`` —
   ``core ⇔ degree >= min_pts``.
3. **Density connectivity**: core–core pairs are edges; components
   collapse with the alternating large/small-star CC
   (`dedup_cc.connected_components`, O(log n) rounds) — identical
   machinery to the MinHash / SemDeDup dedup collapses, so cluster id =
   min core id of the component, bit-stable across partitionings.
4. **Border assignment**: non-core points join their core ε-neighbors
   and take ``min(cluster_id)``. Textbook DBSCAN leaves border ties
   scan-order-dependent; a distributed engine has no scan order, so the
   min-rule is the documented deterministic tie-break (same convention
   as the overlay reference-point dedup).
5. Everything else is ``noise`` (cluster_id = -1).

Scale shape at 100 TB: the pair stage is the ε-join's (bounded by
neighborhood size, not n²); degree/core is one partial-agg shuffle; CC
touches only core–core edges (≪ pairs); border assignment is one more
bounded-fanout join. No driver-side iteration over data — the only loop
is CC's O(log n) fixpoint, independent of eps density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup_cc import connected_components
from .distance_join import distance_join


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "q_id",
    x_col: str = "qx",
    y_col: str = "qy",
    level: int | None = None,
) -> DataFrame:
    """Cluster ``points`` (integer coords) with exact Euclidean DBSCAN.

    Returns one row per input point: ``(id_col, role, cluster_id)`` where
    ``role ∈ {'core','border','noise'}`` and ``cluster_id`` is the minimum
    core point id of the density-connected cluster (-1 for noise).
    ``min_pts`` counts the point itself, as in the original formulation.
    """
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1; got {min_pts}")
    pts = points.select(
        F.col(id_col).alias("q_id"), F.col(x_col).alias("qx"), F.col(y_col).alias("qy")
    )
    other = pts.select(
        F.col("q_id").alias("p_id"), F.col("qx").alias("px"), F.col("qy").alias("py")
    )
    # (a, b) for every b within eps of a — self-pair included (dist_sq = 0)
    pairs = distance_join(
        pts, other, radius=eps, ax="qx", ay="qy", bx="px", by="py", level=level
    ).select("q_id", "p_id")
    # pairs feeds three consumers (degree, edges, border); its ε-join is
    # the expensive stage, so materialize once
    pairs = pairs.localCheckpoint(eager=True)

    deg = pairs.groupBy("q_id").agg(F.count("*").alias("deg"))
    core = deg.filter(F.col("deg") >= min_pts).select("q_id")

    core_u = core.select(F.col("q_id").alias("u"))
    edges = (
        pairs.join(core_u, pairs["q_id"] == core_u["u"]).drop("u")
        .join(core_u, pairs["p_id"] == core_u["u"]).drop("u")
        .filter(F.col("q_id") < F.col("p_id"))
        .select(F.col("q_id").alias("u"), F.col("p_id").alias("v"))
    )
    comps = connected_components(edges, nodes=core.select(F.col("q_id").alias("node")))
    core_lab = comps.select(F.col("node").alias("q_id"), F.col("rep").alias("cluster_id"))

    border = (
        pairs.join(
            core_lab.select(F.col("q_id").alias("p_id"), "cluster_id"), "p_id"
        )
        .join(core, "q_id", "left_anti")
        .groupBy("q_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    labeled = core_lab.select("q_id", F.lit("core").alias("role"), "cluster_id").unionByName(
        border.select("q_id", F.lit("border").alias("role"), "cluster_id")
    )
    return (
        pts.select("q_id")
        .join(labeled, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.coalesce("cluster_id", F.lit(-1)).cast("long").alias("cluster_id"),
        )
    )
