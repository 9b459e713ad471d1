"""Exact two-sample rank tests — Mann-Whitney U and Kolmogorov-Smirnov D.

The distribution-comparison primitives a data-quality / drift pipeline
runs between cohorts (did 'purchase' values shift vs 'click'? does zone
A's pixel distribution differ from zone B's?) — here in EXACT integer
form, the engine's cross-engine-reproducibility discipline
(tests/oracle.py): rank statistics are COUNTING statistics, so no float
arithmetic is needed until the caller divides.

Mann-Whitney with midrank tie handling, 2×-scaled to stay integral:
    2·R_a = Σ_x n_a(x) · (2·cumBefore(x) + n(x) + 1)
    2·U_a = 2·R_a − n_a·(n_a+1),   2·U_b = 2·n_a·n_b − 2·U_a
where n_g(x) are per-value group counts and cumBefore(x) the combined
count of strictly smaller values. KS from the same scan:
    ks_num = max_x | cumIncl_a(x)·n_b − cumIncl_b(x)·n_a |
    D = ks_num / (n_a·n_b)        (the ONE double division, IEEE-exact)

Scale shape (round-5 rework, VERDICT r4 #4): one map-combined count
keyed by value, then a TWO-PHASE prefix scan — the skyline_2d pattern,
made domain-agnostic.  Rounds 1–4 ran ONE unpartitioned window over the
distinct-value table, bounded only by a documented quantized-domain
contract; for a continuous value domain at corpus scale that table is
corpus-sized and the contract silently broke.  Now:

1. the distinct-value table is ``repartitionByRange(P, val)`` — Spark's
   own sampled range partitioner gives P sorted, non-overlapping value
   ranges for ANY orderable domain (no bucket-width tuning, no libm
   monotonicity hazard);
2. within-range prefix sums run under ``Window.partitionBy(pid)`` —
   fully partitioned, P-way parallel;
3. the only global-order window runs over the P-row per-range totals
   table (cardinality = the partition count, data-INDEPENDENT by
   construction — the boundedness the r4 contract only documented), and
   is broadcast back.

Correctness does not depend on where the range boundaries land: prefix
sums are associative over the ordered concatenation of ranges, and each
distinct value lands in exactly one range (pinned by a
partition-count-invariance test).  Values are only ORDERED and grouped,
never added — float values are safe as keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_tests_2sample(
    df: DataFrame,
    group: str,
    value: str,
    group_a: str,
    group_b: str,
    split_partitions: int | None = None,
) -> DataFrame:
    """One row: ``(n_a, n_b, u2_a, u2_b, ks_num, ks_d)`` comparing the
    ``value`` distributions of ``group == group_a`` vs ``group_b``.
    ``u2_* = 2·U_*`` and ``ks_num`` are exact int64; ``ks_d`` is the one
    double division ks_num / (n_a·n_b). Identity ``u2_a + u2_b =
    2·n_a·n_b`` holds exactly (pinned in tests). Rows in neither group
    are ignored; NULL values are ignored.  ``split_partitions`` sets the
    range-split width P (default: ``spark.sql.shuffle.partitions``);
    the result is invariant to it."""
    spark = df.sparkSession
    if split_partitions is None:
        split_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cnt = (
        df.filter(F.col(group).isin(group_a, group_b) & F.col(value).isNotNull())
        .groupBy(F.col(value).alias("val"))
        .agg(
            F.sum(F.when(F.col(group) == group_a, 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col(group) == group_b, 1).otherwise(0)).alias("nb"),
        )
    )
    # phase 1: P sorted value ranges; pid is monotone in val across ranges
    ranged = cnt.repartitionByRange(split_partitions, "val").withColumn(
        "pid", F.spark_partition_id()
    )
    w_excl = (
        Window.partitionBy("pid").orderBy("val").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_incl = (
        Window.partitionBy("pid").orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = ranged.select(
        "pid",
        "na",
        "nb",
        F.coalesce(F.sum(F.col("na") + F.col("nb")).over(w_excl), F.lit(0)).alias("lcb"),
        F.sum("na").over(w_incl).alias("lca"),
        F.sum("nb").over(w_incl).alias("lcbi"),
    )
    # phase 2: cross-range exclusive prefixes over the P-row totals table —
    # a deliberate single-partition window whose input cardinality is the
    # split width P, data-independent by construction.  The partition key is
    # the constant pid&0 (a bare lit(0) would be constant-folded out of the
    # spec, reintroducing the WindowExec no-partition warning).
    ptot = ranged.groupBy("pid").agg(
        F.sum("na").alias("pna"), F.sum("nb").alias("pnb")
    )
    w_p = (
        Window.partitionBy(F.col("pid").bitwiseAND(F.lit(0)))
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pprev = ptot.select(
        "pid",
        F.coalesce(F.sum(F.col("pna") + F.col("pnb")).over(w_p), F.lit(0)).alias("pcb"),
        F.coalesce(F.sum("pna").over(w_p), F.lit(0)).alias("pca"),
        F.coalesce(F.sum("pnb").over(w_p), F.lit(0)).alias("pcbi"),
    )
    tot = ptot.agg(F.sum("pna").alias("ta"), F.sum("pnb").alias("tb"))
    per_val = (
        loc.join(F.broadcast(pprev), "pid")
        .crossJoin(F.broadcast(tot))
        .select(
            "na",
            "nb",
            (F.col("pcb") + F.col("lcb")).alias("cb"),
            (F.col("pca") + F.col("lca")).alias("ca"),
            (F.col("pcbi") + F.col("lcbi")).alias("cbi"),
            "ta",
            "tb",
        )
    )
    return per_val.agg(
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
        F.sum(F.col("na") * (2 * F.col("cb") + F.col("na") + F.col("nb") + 1))
        .cast("long")
        .alias("r2_a"),
        F.max(F.abs(F.col("ca") * F.col("tb") - F.col("cbi") * F.col("ta")))
        .cast("long")
        .alias("ks_num"),
    ).select(
        "n_a",
        "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).alias("u2_a"),
        (
            2 * F.col("n_a") * F.col("n_b")
            - (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        ).alias("u2_b"),
        "ks_num",
        F.when(
            F.col("n_a") * F.col("n_b") > 0,
            F.col("ks_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        ).alias("ks_d"),  # NULL (not NaN) when a group is empty — cross-engine safe
    )


def rank_tests_2sample_sql(
    source_sql: str, group: str, value: str, group_a: str, group_b: str
) -> str:
    """DuckDB mirror of :func:`rank_tests_2sample` (oracle pairing)."""
    return f"""WITH src AS ({source_sql}),
cnt AS (
  SELECT {value} AS val,
         SUM(CASE WHEN {group} = '{group_a}' THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN {group} = '{group_b}' THEN 1 ELSE 0 END) AS nb
  FROM src
  WHERE {group} IN ('{group_a}', '{group_b}') AND {value} IS NOT NULL
  GROUP BY 1),
per AS (
  SELECT na, nb,
         COALESCE(SUM(na + nb) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
         SUM(na) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(nb) OVER (ORDER BY val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cbi
  FROM cnt),
agg AS (
  SELECT CAST(SUM(na) AS BIGINT) AS n_a,
         CAST(SUM(nb) AS BIGINT) AS n_b,
         CAST(SUM(na * (2 * cb + na + nb + 1)) AS BIGINT) AS r2_a,
         CAST(MAX(ABS(ca * (SELECT SUM(nb) FROM per)
                    - cbi * (SELECT SUM(na) FROM per))) AS BIGINT) AS ks_num
  FROM per)
SELECT n_a, n_b,
       r2_a - n_a * (n_a + 1) AS u2_a,
       2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
       ks_num,
       CASE WHEN n_a * n_b > 0
            THEN CAST(ks_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)
            END AS ks_d
FROM agg"""
