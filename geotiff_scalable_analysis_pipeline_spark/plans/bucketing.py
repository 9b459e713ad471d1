"""Bucketed tables — shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling BOTH
sides on the key, every time the join runs. Spark's bucketed tables move
that shuffle to write time, once: ``bucketBy(n, key)`` hash-partitions the
table's files by ``pmod(hash(key), n)`` at write, and every subsequent join
of two tables bucketed on the same key with compatible bucket counts —
or any groupBy on the key — reads the buckets as pre-distributed input
partitions with ZERO Exchange in the plan (and zero per-task Sort when
``sortBy`` matches the join key and each bucket is a single file). The
write cost is amortized over every downstream consumer, which is the right
trade for join-stable fact tables: a media manifest keyed by ``media_ref``,
a document corpus keyed by ``doc_id``, an embedding table keyed by
``vec_id`` that every dedup/ANN/labeling pass re-joins.

The reference engine has no analogue (single-node, one process reads
everything); this is the Spark-native answer to its "everything is already
in memory" assumption. Plan shape pinned by
tests/test_plans.py::test_bucketed_join_has_no_exchange (bucketed join: no
Exchange; identical unbucketed join: Exchange on both sides).

Cluster sizing rule: pick ``n_buckets`` so one bucket of the BIGGER table
is a comfortable task (~128-512 MB of parquet) — buckets are the
parallelism floor for every consumer; too few large buckets serialize the
cluster, too many produce small files (each writer task writes up to one
file per bucket it touches — ``repartition(key)`` before a bucketed write
keeps that to one file per bucket, which is also the zero-Sort condition).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    n_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a parquet table bucketed (and by default sorted) on
    ``key``. ``path`` makes it an external table at that location (tests use
    tmp dirs); without it the session warehouse dir is used.

    The ``repartition(n_buckets, key)`` before the write co-locates each
    bucket's rows in one task, so each bucket is ONE file — the condition
    for Spark to skip both the Exchange and the Sort in downstream
    sort-merge joins on the key."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_name: str, right_name: str, on: str | list[str]
) -> DataFrame:
    """Equi-join two tables previously written by :func:`write_bucketed` on
    the same key. When both are bucketed on the join key the sort-merge join
    consumes the buckets directly — no Exchange on either side. Broadcast
    is suppressed via a join hint (a broadcast would hide the co-location;
    at the fact×fact scale this operator exists for, the planner would pick
    SMJ anyway)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_name).hint("merge").join(spark.table(right_name), keys)
