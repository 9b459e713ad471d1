"""Cohort-retention and Markov-transition semantics the value-hash gate
can't articulate: day-0 completeness, monotone cohort shrinkage bounds,
and ppm row normalization."""

from __future__ import annotations

from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
    q_cohort_retention,
    q_event_transitions,
)

SF_DIR = "/root/testdata/sf0.01"


def test_cohort_day0_covers_every_user_once(spark):
    rows = q_cohort_retention(spark, SF_DIR).collect()
    day0 = {r["cohort_day"]: r["active_users"] for r in rows if r["days_since"] == 0}
    # every user is active on their own first day, so Σ day-0 = distinct users
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(day0.values()) == n_users
    # no cell can exceed its cohort's day-0 population
    for r in rows:
        assert r["active_users"] <= day0[r["cohort_day"]]


def test_transition_ppm_rows_normalize(spark):
    rows = q_event_transitions(spark, SF_DIR).collect()
    by_prev: dict[str, list] = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        total = sum(r["cnt"] for r in rs)
        ppm_sum = sum(r["ppm"] for r in rs)
        # floor division loses < 1 ppm per cell
        assert 1_000_000 - len(rs) < ppm_sum <= 1_000_000, (prev, ppm_sum)
        assert all(0 < r["ppm"] or r["cnt"] * 1_000_000 < total for r in rs)
