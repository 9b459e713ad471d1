"""FastSS distance-1 pairs (queries_text.fastss_pairs) — brute-force
Levenshtein parity on synthetic vocabularies, the transposition
false-positive (must be filtered by the verify), completeness of the
deletion neighborhood for all three edit kinds, and the length cap."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark.queries_text import (
    FASTSS_MAX_LEN,
    fastss_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(vocab):
    v = sorted({t for t in vocab if t and len(t) <= FASTSS_MAX_LEN})
    return {
        (a, b, 1)
        for i, a in enumerate(v)
        for b in v[i + 1:]
        if _lev(a, b) <= 1
    }


def _run(spark, vocab):
    df = spark.createDataFrame([(t,) for t in vocab], "tok string")
    return {tuple(r) for r in fastss_pairs(df).collect()}


words = st.text(alphabet="abc", min_size=1, max_size=5)


@settings(max_examples=15, deadline=None)
@given(vocab=st.lists(words, min_size=2, max_size=25))
def test_fastss_matches_brute_force(spark, vocab):
    assert _run(spark, vocab) == _brute(vocab)


def test_transposition_is_filtered_not_emitted(spark):
    # 'ab' and 'ba' share deletion variants 'a' and 'b' (candidate!) but
    # sit at Levenshtein distance 2 — the verify must kill the pair
    assert _run(spark, ["ab", "ba"]) == set()


def test_all_three_edit_kinds_found(spark):
    got = _run(spark, ["cat", "cut", "cats", "at", "dog"])
    assert got == {
        ("cat", "cut", 1),   # substitution
        ("cat", "cats", 1),  # insertion
        ("at", "cat", 1),    # deletion
        ("at", "cats", 1) if _lev("at", "cats") <= 1 else None,
    } - {None}


def test_overlong_tokens_are_excluded(spark):
    long_tok = "a" * (FASTSS_MAX_LEN + 1)
    assert _run(spark, [long_tok, long_tok[:-1]]) == set()
