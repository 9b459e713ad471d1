"""Temporal stack frame rule (R3+R4) vs an independent numpy oracle.

The oracle recomputes ``frame[t] = series[min(t, n-1)]`` (truncate / pad by
last / replicate len-1) from scratch on a python-sorted series — no shared
code with the Catalyst ``array_sort(collect_list)`` path.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geotiff_scalable_analysis_pipeline_spark.operators.temporal import temporal_stack

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # ts (duplicates exercised)
        st.integers(min_value=0, max_value=10**6),  # value
    ),
    min_size=1,
    max_size=9,
)


@settings(max_examples=25, deadline=None)
@given(
    groups=st.lists(series_strategy, min_size=1, max_size=4),
    num_frames=st.integers(min_value=1, max_value=7),
)
def test_temporal_stack_frame_rule_matches_oracle(spark, groups, num_frames):
    rows = []
    for g, series in enumerate(groups):
        for i, (ts, v) in enumerate(series):
            # tiebreak must be unique per row for a deterministic order
            rows.append((g, 0, ts, f"m{i:04d}", v))
    df = spark.createDataFrame(rows, "cell long, band long, ts_h long, media_ref string, v long")
    got = {
        (r.cell, r.band, r.t): (r.n_acq, r.v)
        for r in temporal_stack(df, num_frames).collect()
    }
    want = {}
    for g, series in enumerate(groups):
        ordered = [v for _, _, v in sorted((ts, f"m{i:04d}", v) for i, (ts, v) in enumerate(series))]
        for t in range(num_frames):
            want[(g, 0, t)] = (len(series), ordered[min(t, len(series) - 1)])
    assert got == want


def test_temporal_stack_replicates_single_acquisition(spark):
    df = spark.createDataFrame(
        [(1, 2, 100, "m0", 42)], "cell long, band long, ts_h long, media_ref string, v long"
    )
    out = temporal_stack(df, 4).orderBy("t").collect()
    assert [(r.t, r.v, r.n_acq) for r in out] == [(0, 42, 1), (1, 42, 1), (2, 42, 1), (3, 42, 1)]
