"""Exactly-once distributed triangle counting (degree-ordered wedges).

The fourth graph operator (pagerank.py, graph_bfs.py, dedup_cc.py): count
the triangles each node participates in — the clustering-coefficient /
community-density primitive every graph-analytics stack ships, and the
canonical example of a join whose naive form explodes and whose
degree-ordered form provably doesn't (Schank 2007; Suri & Vassilvitskii
"Counting Triangles and the Curse of the Last Reducer", WWW 2011).

Shape:

1. Canonicalize to a SIMPLE undirected graph: drop self-loops, collapse
   parallel/reversed duplicates to one ``u < v`` edge (one hash
   aggregate).
2. Compute degrees; ORIENT every edge from the (degree, id)-smaller to
   the (degree, id)-larger endpoint — the total order packed as the
   scalar ``rank = degree·K + id`` (K > max id; identical order to the
   lexicographic (degree, id) pair, which the DuckDB mirror uses via
   row-value comparison; the scalar keeps the hot wedge filter in
   codegen).
3. Wedges: self-join oriented edges on their SOURCE — each wedge is
   generated at its lowest-rank vertex, so a node contributes
   ``C(d⁺, 2)`` pairs where its OUT-degree ``d⁺ ≤ O(√m)`` — the
   orientation is exactly what caps the hub blow-up that makes the
   unordered wedge join quadratic in hub degree ("the curse of the last
   reducer"). A rank-ordered ``v < w`` guard keeps each wedge once.
4. Close: LEFT SEMI join of the wedge stream against the oriented edge
   set on ONE packed int64 key ``v·K + w`` — each triangle found exactly
   once (at its lowest-rank vertex), then exploded to its 3 member nodes
   and counted with one map-combined aggregate.

The close-key packing is a measured contention fix, not cosmetics: with
the natural 2-column ``(v, w)`` key the broadcast build is a compound-key
UnsafeHashedRelation whose ~200 MB of pages every core probes at random —
the stage's total CPU INFLATED 62.7 → 166.7 core-s going local[2] →
local[8] at 266 M wedges (memory-latency contention; per-task durations
uniform, zero GC, cores 94 % busy — the classic false "doesn't scale"
shape). A single int64 key builds a keys-only LongHashedRelation a
fraction of the size, and the same sweep measured the stage CPU FLAT
(33.7 vs 35.8 core-s) across the two levels. On a multi-executor cluster
the same packing shrinks the broadcast and halves probe cost.

All joins are hash equi-joins on node keys; nothing is quadratic in the
corpus; no window, no distinct beyond the initial canonicalization. The
wedge side is CPU-dense/byte-light, so the join inputs take the engine's
standard wave-partition pin (plans/skew.py — AQE's byte-based coalescing
otherwise serializes the stage; BENCH/BASELINE.md round-4 provenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.skew import cpu_dense_repartition


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_close: bool = True,
    max_id: int | None = None,
) -> DataFrame:
    """Per-node triangle participation: ``(node, n_triangles)``, nodes with
    at least one triangle. Input may contain self-loops, duplicates, and
    both orientations; they do not change the answer.

    ``broadcast_close`` (default): the closing membership test semi-joins
    the WEDGE STREAM (the big side — Σ C(d⁺,2) rows, orders of magnitude
    above the edge count) against a BROADCAST of the packed oriented edge
    keys, so the wedges never shuffle — they are generated, filtered, and
    aggregated inside one stage (measured: the shuffled close was 24.3 s
    of a 36 s wall at 266 M wedges / 2.4 M edges; broadcasting removes an
    ~11 GB exchange). Pass ``False`` when the simple edge set itself is
    too big to broadcast (≳10⁸ edges) — the close then falls back to a
    shuffled semi join on the same packed single-long key (8-byte key,
    24-byte rows — the cheapest exchange the close can be).

    ``max_id``: optional upper bound on node ids. When the caller knows it
    (e.g. ids minted by ``row_number`` or a bounded generator), the rank/
    key base ``K = max_id + 1`` is embedded as a literal, eliding an extra
    scan of the edge set plus a 1-row broadcast — at bench scale 2000 that
    sub-job is ~1 s of serial critical path per run. Unset, K is computed
    with a one-row aggregate (correct for any input).

    Overflow bound (both packings, rank ``d·K + id`` and close key
    ``v·K + w``): needs K² < 2⁶³, i.e. < 3·10⁹ nodes — beyond any graph
    this engine will see (revisit with DECIMAL ranks if it ever isn't).
    """
    simple = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    deg = (
        simple.select(F.col("u").alias("node"))
        .unionAll(simple.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # total order: rank = d·K + id packed into ONE int64. A (degree, id)
    # STRUCT comparison is semantically identical but struct compares run
    # interpreted in the 10⁸-row wedge filter — measured 27.9 s → 18.2 s
    # at 266 M wedges by switching to the scalar.
    withk = (
        simple.withColumn("_k", F.lit(int(max_id) + 1).cast("long"))
        if max_id is not None
        else simple.crossJoin(
            F.broadcast(
                simple.agg((F.greatest(F.max("u"), F.max("v")) + 1).alias("_k"))
            )
        )
    )
    oriented = (
        withk.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.expr("CASE WHEN du*_k+u < dv*_k+v THEN u ELSE v END").alias("a"),
            F.expr("CASE WHEN du*_k+u < dv*_k+v THEN v ELSE u END").alias("b"),
            F.expr("greatest(du*_k+u, dv*_k+v)").alias("rb"),
            F.col("_k"),
        )
    )

    e1 = cpu_dense_repartition(
        oriented.select(
            F.col("a").alias("w_src"),
            F.col("b").alias("w_v"),
            F.col("rb").alias("w_rv"),
            F.col("_k"),
        ),
        "w_src",
    )
    e2 = cpu_dense_repartition(
        oriented.select(
            F.col("a").alias("w_src"),
            F.col("b").alias("w_w"),
            F.col("rb").alias("w_rw"),
        ),
        "w_src",
    )
    wedges = (
        e1.join(e2, "w_src")
        .filter(F.col("w_rv") < F.col("w_rw"))
        .select(
            "w_src",
            "w_v",
            "w_w",
            (F.col("w_v") * F.col("_k") + F.col("w_w")).alias("w_key"),
        )
    )
    closing = oriented.select((F.col("a") * F.col("_k") + F.col("b")).alias("w_key"))
    if broadcast_close:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, "w_key", "left_semi").select(
        F.col("w_src").alias("n1"), F.col("w_v").alias("n2"), F.col("w_w").alias("n3")
    )
    member = F.explode(F.array("n1", "n2", "n3")).alias("node")
    return tri.select(member).groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def triangle_counts_sql(edges_cte: str, edges_alias: str) -> str:
    """DuckDB mirror of :func:`triangle_counts` (oracle pairing)."""
    return f"""WITH {edges_cte},
simple AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v
  FROM {edges_alias} WHERE src <> dst GROUP BY 1, 2),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM simple UNION ALL SELECT v FROM simple) GROUP BY 1),
oriented AS (
  SELECT CASE WHEN (d1.d, u) < (d2.d, v) THEN u ELSE v END AS a,
         CASE WHEN (d1.d, u) < (d2.d, v) THEN v ELSE u END AS b,
         CASE WHEN (d1.d, u) < (d2.d, v) THEN d2.d ELSE d1.d END AS rbd,
         CASE WHEN (d1.d, u) < (d2.d, v) THEN v ELSE u END AS rbn
  FROM simple
  JOIN deg d1 ON d1.node = simple.u
  JOIN deg d2 ON d2.node = simple.v),
tri AS (
  SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
  FROM oriented e1
  JOIN oriented e2 ON e2.a = e1.a AND (e1.rbd, e1.rbn) < (e2.rbd, e2.rbn)
  JOIN oriented e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT n1 AS node FROM tri
  UNION ALL SELECT n2 FROM tri
  UNION ALL SELECT n3 FROM tri)
GROUP BY node"""
