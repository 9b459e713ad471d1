"""Data-quality checks (dq_checks_frames) — a dirty synthetic corpus must
produce the exact violation counts per check; the clean sf corpus (all
zeros) is covered by the entry-contract oracle gate."""

from __future__ import annotations

import datetime

from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
    dq_checks_frames,
)


def test_dirty_corpus_counts_every_violation(spark):
    ts = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, ts, "1-URGENT"),   # clean
            (2, 10, "F", 7.0, ts, "2-HIGH"),     # clean
            (2, 11, "O", 3.0, ts, "2-HIGH"),     # dup pk (both rows count)
            (3, 99, "O", 4.0, ts, "3-MEDIUM"),   # orphan custkey
            (4, 10, "X", 4.0, ts, "3-MEDIUM"),   # bad status
            (5, 10, "O", -2.0, ts, "3-MEDIUM"),  # bad price
            (6, 10, "O", None, ts, "3-MEDIUM"),  # null price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "BUILDING"), (11, "b", 1, 0.0, "AUTOMOBILE")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    got = {r["check"]: r["violations"] for r in dq_checks_frames(orders, customer).collect()}
    assert got == {
        "pk_unique_o_orderkey": 2,
        "fk_orders_customer": 1,
        "domain_o_orderstatus": 1,
        "range_o_totalprice_positive": 2,
    }


def test_clean_corpus_is_all_zero(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", 5.0, datetime.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    got = {r["check"]: r["violations"] for r in dq_checks_frames(orders, customer).collect()}
    assert set(got.values()) == {0} and len(got) == 4
