"""Grouped exact-correlation query (queries_relational.q_brand_qty_price_corr)
— python-bigint reference parity on the sf0.001 tables (unbounded ints, so
the reference can't overflow or round anywhere)."""

from __future__ import annotations

import duckdb

from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
    q_brand_qty_price_corr,
)

SF = "/root/testdata/sf0.001"


def _r2_ppm_reduced(num: int, dx: int, dy: int):
    """Bigint mirror of the engine's overflow-safe squaring (ADVICE r4):
    reduce |num|/dx/dy by the SAME 10^k, k = max(0, maxdigits − 16), before
    squaring — the common k cancels in the ratio; NULL when a denominator
    underflows the reduction."""
    a = abs(num)
    k = max(0, max(len(str(a)), len(str(dx)), len(str(dy))) - 16)
    p = 10**k
    ar, dxr, dyr = a // p, dx // p, dy // p
    if dx > 0 and dy > 0 and dxr > 0 and dyr > 0:
        return (ar * ar * 1_000_000) // (dxr * dyr)
    return None


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
        out[b] = (n, sign, _r2_ppm_reduced(num, dx, dy))
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
    want = (n, (num > 0) - (num < 0), _r2_ppm_reduced(num, dx, dx))
    r = q_degree_assortativity(spark, "unused").collect()[0]
    assert (r["n"], r["corr_sign"], r["r2_ppm"]) == want


def test_reduction_tracks_exact_rational_r2():
    """Property: wherever the reduced operands keep ≥8 significant digits,
    the overflow-safe r2_ppm is within 2 ppm units of the exact rational
    10⁶·num²/(dx·dy) — across magnitudes up to 10²⁵ (far beyond the old
    formula's 38-digit ceiling). Cauchy-Schwarz (num² ≤ dx·dy) pins the
    generated inputs to the statistically reachable region."""
    import math
    import random

    rng = random.Random(20260820)
    checked = 0
    for _ in range(500):
        dx = rng.randint(1, 10 ** rng.randint(1, 25))
        dy = rng.randint(1, 10 ** rng.randint(1, 25))
        bound = math.isqrt(dx * dy)
        num = rng.randint(-bound, bound)
        red = _r2_ppm_reduced(num, dx, dy)
        k = max(
            0,
            max(len(str(abs(num))), len(str(dx)), len(str(dy))) - 16,
        )
        digits_kept = min(
            len(str(abs(num))), len(str(dx)), len(str(dy))
        ) - k
        if red is None:
            # only the documented underflow case may return NULL
            assert any(v // 10**k == 0 for v in (dx, dy))
            continue
        exact = num * num * 1_000_000 / (dx * dy)
        if digits_kept >= 8:
            assert abs(red - exact) <= 2, (num, dx, dy, red, exact)
            checked += 1
    assert checked > 50  # the bound was actually exercised


def test_huge_scale_no_overflow_and_engines_agree(spark, tmp_path):
    """ADVICE r4 regression: with 10¹⁰-scale quantities and 10¹⁰-scale
    prices, num ≈ 6·10²² — the pre-round-5 formula's num²·10⁶ crossed 38
    digits, so Spark yielded NULL while DuckDB HUGEINT raised (divergent
    failure).  The reduced formula must (a) run on both engines, (b) agree
    exactly, and (c) return 10⁶ ppm for this perfectly-correlated input."""
    import duckdb as dk
    import pyspark.sql.functions as F

    from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
        SQL_BRAND_CORR,
    )

    li = spark.createDataFrame(
        [(1, float(q) * 1e10, float(q) * 1e10) for q in (1, 2, 3)],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    pt = spark.createDataFrame([(1, "Brand#XL")], "p_partkey long, p_brand string")
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    pt.write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    got = q_brand_qty_price_corr(spark, str(tmp_path)).collect()[0]
    assert (got["corr_sign"], got["r2_ppm"]) == (1, 1_000_000)

    con = dk.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    _brand, dn, dsign, dr2 = con.execute(SQL_BRAND_CORR).fetchall()[0]
    assert (dsign, dr2) == (got["corr_sign"], got["r2_ppm"])
    assert dn == got["n"] == 3
