"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle must match DuckDB on row count, column names, and an
order-insensitive value multiset."""

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck_views(duck):
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return duck


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact repr — parity must be bitwise
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return out


ALL = sorted(entrymod.queries().keys())
WITH_ORACLE = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck_views, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_views.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(duck_rows, duck_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(ms_s, ms_d)) if a != b][:3]
    assert ms_s == ms_d, f"{name}: first mismatches {[(ms_s[i], ms_d[i]) for i in mismatches]}"


def test_every_query_is_oracle_paired():
    """All driver queries carry a DuckDB oracle — no rows-only leftovers.

    (Replaces the old rows-only parametrization, which skipped on an empty
    parameter set once the last two queries were oracle-paired in round 3.)
    """
    assert [n for n in ALL if n not in WITH_ORACLE] == []


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "zone_id" in df.columns
