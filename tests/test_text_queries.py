"""Text-pipeline query semantics the sf corpora cannot exercise.

The driver corpora contain no exact-duplicate texts (500/500 distinct md5 at
sf0.01), so ``corpus_filter_pipeline``'s dedup branch — and in particular the
sequential-pipeline KEEPER rule (dedup runs AFTER the length/quality filters,
so the keeper is the min doc_id among filter SURVIVORS) — is pinned here on a
synthetic corpus with duplicate groups, against the same DuckDB oracle SQL.
"""

import pandas as pd

from geotiff_scalable_analysis_pipeline_spark.queries_text import (
    FILTER_MIN_STOPWORD_RATIO,
    FILTER_MIN_TOKENS,
    SQL_CORPUS_FILTER,
    corpus_filter_verdicts,
)


def _mk_text(n_tokens: int, stopwordy: bool = True) -> str:
    # 1-in-5 "the" keeps the stopword ratio comfortably above the threshold
    base = ["the" if stopwordy and i % 5 == 0 else f"w{i}" for i in range(n_tokens)]
    return " ".join(base)


def _corpus() -> pd.DataFrame:
    good_dup = _mk_text(40)  # passes both filters
    short_dup = _mk_text(45)  # distinct text from good_dup, also passing
    rows = [
        # group A: three identical passing docs -> keeper = min id (10)
        (10, good_dup, "en"),
        (11, good_dup, "en"),
        (12, good_dup, "en"),
        # group B: min-id copy FAILS the length filter; the two surviving
        # copies must still keep exactly one (doc 21), not zero
        (20, _mk_text(FILTER_MIN_TOKENS - 5), "en"),  # drop_length (unique text)
        (21, short_dup, "de"),
        (22, short_dup, "de"),
        # group C: duplicate pair where both fail quality -> both drop_quality,
        # no drop_duplicate attribution
        (30, " ".join(f"q{i}" for i in range(40)), "fr"),
        (31, " ".join(f"q{i}" for i in range(40)), "fr"),
        # unique passing doc
        (40, _mk_text(60), "en"),
    ]
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def test_corpus_filter_dedup_keeps_survivor_copy(spark, duck):
    pdf = _corpus()
    got = {
        (r["lang"], r["verdict"]): r["n_docs"]
        for r in corpus_filter_verdicts(spark.createDataFrame(pdf)).collect()
    }
    # group A: 10 keeps, 11/12 drop_duplicate; group B: 21 keeps (its min-id
    # sibling 20 has DIFFERENT text; 21 < 22 among survivors), 22 dups;
    # group C: both drop_quality; doc 40 keeps; doc 20 drop_length.
    assert got == {
        ("en", "keep"): 2,  # 10, 40
        ("en", "drop_duplicate"): 2,  # 11, 12
        ("en", "drop_length"): 1,  # 20
        ("de", "keep"): 1,  # 21
        ("de", "drop_duplicate"): 1,  # 22
        ("fr", "drop_quality"): 2,  # 30, 31
    }
    # sanity on the fixture: group C really does fail quality only
    assert all(
        len([t for t in txt.split() if t == "the"]) / len(txt.split())
        < FILTER_MIN_STOPWORD_RATIO
        for txt in pdf[pdf.doc_id.isin([30, 31])].text
    )


def test_corpus_filter_oracle_agrees_on_duplicates(spark, duck):
    pdf = _corpus()
    spark_rows = sorted(
        tuple(r) for r in corpus_filter_verdicts(spark.createDataFrame(pdf)).collect()
    )
    duck.register("documents", pdf)
    try:
        res = duck.execute(SQL_CORPUS_FILTER)
        cols = [d[0] for d in res.description]
        idx = [cols.index(c) for c in ("lang", "verdict", "n_docs")]
        duck_rows = sorted(tuple(r[i] for i in idx) for r in res.fetchall())
    finally:
        duck.unregister("documents")
    assert spark_rows == duck_rows


def test_weighted_zonal_overlap_boundary_convention(spark):
    """Hand-computed overlap weights pin the half-open convention: tile
    pixels cover [x0, x1) and a closed zone box [minx, maxx] counts as
    [minx, maxx+1). (The contract test can't catch a shared off-by-one —
    the same clamp expression appears in the Spark query AND the oracle.)"""
    from pyspark.sql import functions as F

    from geotiff_scalable_analysis_pipeline_spark.operators.zonal import (
        zonal_stats_weighted,
    )

    # tile 10×10 at [0,10)²; zone closed [5,9]² → overlap [5,10)² = 25
    # zone closed [0,4]×[0,9] → [0,5)×[0,10) = 50; zone touching at x=10 → 0
    pairs = spark.createDataFrame(
        [("t0", 1, 25), ("t0", 2, 50)], "media_ref string, zone_id int, w long"
    )
    stats = spark.createDataFrame(
        [("t0", 0, 100, 700)], "media_ref string, band int, cnt long, sum_dn long"
    ).select("media_ref", "band", "cnt", "sum_dn",
             F.col("sum_dn").alias("sum_cal"))
    out = {r["zone_id"]: r for r in zonal_stats_weighted(pairs, stats).collect()}
    assert out[1]["w_total"] == 25 and out[1]["wpx_cnt"] == 25 * 100
    assert out[2]["wsum_dn"] == 50 * 700
    assert out[2]["wmean_dn"] == 700 / 100  # weights cancel for one tile

    # and the geometric rule itself, straight from the query's expressions:
    x0, x1, minx, maxx = 0, 10, 5, 9
    assert min(x1, maxx + 1) - max(x0, minx) == 5  # [5,10) ∩ [5,10) = 5
    # zone starting exactly at the tile's exclusive edge overlaps nothing
    assert max(0, min(x1, 11) - max(x0, 10)) == 0


def test_chunk_windows_cover_and_overlap(spark, tmp_path):
    """Chunk-rule invariants on synthetic docs spanning the edge sizes:
    every token index is covered, consecutive windows overlap by exactly
    CHUNK_O (except a short tail), a ≤W-token doc is one window, and the
    emitted fingerprints/lengths are consistent with the slices."""
    from geotiff_scalable_analysis_pipeline_spark.queries_text import (
        CHUNK_O,
        CHUNK_W,
        q_doc_chunk_windows,
    )

    sizes = [0, 1, CHUNK_W - 1, CHUNK_W, CHUNK_W + 1, 2 * CHUNK_W, 101]
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)), "en", "s", n)
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_doc_chunk_windows(spark, str(tmp_path)).collect()
    stride = CHUNK_W - CHUNK_O
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(len(sizes)))
    for doc_id, n in enumerate(sizes):
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        if n <= CHUNK_W:
            assert len(chunks) == 1 and chunks[0]["len_toks"] == n
        covered = set()
        for r in chunks:
            assert r["start_tok"] == r["chunk_id"] * stride
            assert r["len_toks"] == min(CHUNK_W, n - r["start_tok"])
            covered.update(range(r["start_tok"], r["start_tok"] + r["len_toks"]))
            if r["len_toks"] > 0:
                assert r["first_tok"] == f"t{doc_id}x{r['start_tok']}"
                assert r["last_tok"] == (
                    f"t{doc_id}x{r['start_tok'] + r['len_toks'] - 1}"
                )
        assert covered == set(range(n))
        for a, b in zip(chunks, chunks[1:]):
            got_overlap = a["start_tok"] + a["len_toks"] - b["start_tok"]
            assert got_overlap == CHUNK_O or a["len_toks"] < CHUNK_W


def test_chunk_windows_per_doc_cap_matches_oracle(spark, tmp_path):
    """The oracle joins range(0, CHUNK_MAX), silently capping chunks per
    doc; the engine enforces the same cap with least() (ADVICE r5) so a
    pathological >98k-token document truncates IDENTICALLY in both
    engines. A doc needing CHUNK_MAX+2 windows must emit exactly
    CHUNK_MAX chunks, ids 0..CHUNK_MAX-1, all full-width."""
    from geotiff_scalable_analysis_pipeline_spark.queries_text import (
        CHUNK_MAX,
        CHUNK_O,
        CHUNK_W,
        q_doc_chunk_windows,
    )

    stride = CHUNK_W - CHUNK_O
    n = CHUNK_W + (CHUNK_MAX + 1) * stride  # would need CHUNK_MAX+2 windows
    text = " ".join(f"w{j}" for j in range(n))
    df = spark.createDataFrame(
        [(0, text, "en", "s", n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_doc_chunk_windows(spark, str(tmp_path)).collect()
    assert len(out) == CHUNK_MAX
    assert {r["chunk_id"] for r in out} == set(range(CHUNK_MAX))
    assert all(r["len_toks"] == CHUNK_W for r in out)
