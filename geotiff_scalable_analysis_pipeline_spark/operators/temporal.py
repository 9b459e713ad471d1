"""Temporal replicate / reshape / pad (SURVEY §2 R3+R4).

The reference reshapes multi-temporal stacks ``(N, T·C, P, P) → (N, C, T, P,
P)`` and reconciles the series length with the model's expected frame count
by truncating or padding with the last frame (reference:
src/eo_core/adapters/prithvi_adapter.py:380-413; the single-image replicate
case at :382-386 is the degenerate series of length 1 under the same rule).

Spark-first shape: the time axis is ROWS (one acquisition per row), so the
"reshape" is a grouped sort + frame-index projection — pure Catalyst
(``array_sort(collect_list(struct(...)))`` + ``transform``/``element_at``),
no UDF, map-side partial aggregation before the (cell, band) shuffle. The
frame rule is one formula: ``frame[t] = series[min(t, len-1)]`` — t < len is
the truncate case, t ≥ len repeats the last frame (and len = 1 replicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_COLS = ("n_acq", "t", "v")


def temporal_stack(
    acq: DataFrame,
    num_frames: int,
    keys: tuple[str, ...] = ("cell", "band"),
    ts: str = "ts_h",
    tiebreak: str = "media_ref",
    value: str = "v",
) -> DataFrame:
    """(keys..., ts, tiebreak, value) rows → (keys..., n_acq, t, v) frames.

    Per key group the acquisitions are ordered by (ts, tiebreak); frame t
    takes series[min(t, n-1)] — truncate beyond num_frames, pad-by-last when
    the series is short, replicate when it has a single element.
    """
    ordered = F.array_sort(F.collect_list(F.struct(ts, tiebreak, value)))
    vals = F.transform(ordered, lambda s: s[value])
    g = (
        acq.groupBy(*keys)
        .agg(vals.alias("_vals"), F.count("*").alias("n_acq"))
        .select(*keys, "_vals", "n_acq",
                F.explode(F.sequence(F.lit(0), F.lit(num_frames - 1))).alias("t"))
    )
    return g.select(
        *keys,
        "n_acq",
        F.col("t").cast("int").alias("t"),
        F.element_at(
            "_vals", (F.least(F.col("t"), F.col("n_acq") - 1) + 1).cast("int")
        ).alias("v"),
    )
