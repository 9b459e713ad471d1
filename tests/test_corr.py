"""Grouped exact-correlation query (queries_relational.q_brand_qty_price_corr)
— python-bigint reference parity on the sf0.001 tables (unbounded ints, so
the reference can't overflow or round anywhere)."""

from __future__ import annotations

import duckdb

from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
    q_brand_qty_price_corr,
)

SF = "/root/testdata/sf0.001"


def _reference():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT p.p_brand, CAST(l.l_quantity AS BIGINT),
                   CAST(round(l.l_extendedprice * 100) AS BIGINT)
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    groups: dict = {}
    for b, q, c in rows:
        groups.setdefault(b, []).append((int(q), int(c)))
    out = {}
    for b, vs in groups.items():
        n = len(vs)
        sx = sum(q for q, _ in vs)
        sy = sum(c for _, c in vs)
        sxy = sum(q * c for q, c in vs)
        sxx = sum(q * q for q, _ in vs)
        syy = sum(c * c for _, c in vs)
        num = n * sxy - sx * sy
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        sign = (num > 0) - (num < 0)
        r2_ppm = (num * num * 1_000_000) // (dx * dy) if dx > 0 and dy > 0 else None
        out[b] = (n, sign, r2_ppm)
    return out


def test_matches_python_bigint_reference(spark):
    got = {
        r["p_brand"]: (r["n"], r["corr_sign"], r["r2_ppm"])
        for r in q_brand_qty_price_corr(spark, SF).collect()
    }
    assert got == _reference()
    assert len(got) >= 20  # all brands present


def test_degenerate_group_yields_null_r2(spark):
    # constant quantity within a group -> den_x = 0 -> r2_ppm NULL, sign defined
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, 5, 10), (1, 5, 20), (1, 5, 30)], "g int, q long, c long"
    )
    a = df.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("c")).alias("sxy"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("sxx"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("syy"),
    )
    r = a.select(
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxx") - F.col("sx") * F.col("sx")
        ).alias("dx")
    ).collect()[0]
    assert int(r["dx"]) == 0


def test_assortativity_matches_python_bigint_reference(spark):
    """degree_assortativity vs an unbounded-int reference on the same
    DuckDB-generated deterministic edge list."""
    from geotiff_scalable_analysis_pipeline_spark import datagen as dg
    from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
        _PR_NODES,
        q_degree_assortativity,
    )

    con = duckdb.connect()
    edges = con.execute(
        "WITH " + dg.graph_edges_sql(_PR_NODES).strip() + " SELECT src, dst FROM gedges"
    ).fetchall()
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    deg: dict[int, int] = {}
    for u, v in simple:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs = [(deg[u], deg[v]) for u, v in simple] + [(deg[v], deg[u]) for u, v in simple]
    n = len(xs)
    sx = sum(x for x, _ in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs)
    num, dx = n * sxy - sx * sx, n * sxx - sx * sx
    want = (n, (num > 0) - (num < 0), (num * num * 1_000_000) // (dx * dx))
    r = q_degree_assortativity(spark, "unused").collect()[0]
    assert (r["n"], r["corr_sign"], r["r2_ppm"]) == want
