"""Custom stateful streaming operator — ``applyInPandasWithState``.

The brief's streaming requirement beyond windowed aggregation: an
arbitrary-state operator maintained across micro-batches. This one keeps a
running per-user counter + exact value sum (int64 micros — batching-order
free), the streaming analogue of the batch ``events_type_stats`` /
``events_sessionization`` family.

State layout is explicit (``n long, s long``), timeout disabled (corpus
streams are append-only; a production session-gap variant would use
``GroupStateTimeout.EventTimeTimeout`` with the same body). Every batch
emits the UPDATED running totals for the users it touched — an update-mode
changelog; the latest row per user is the current state (pinned against the
batch aggregate in tests/test_streaming.py across forced multi-batch runs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

VALUE_SCALE = 1_000_000  # double value → int64 micros (exact cross-batch sum)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming frame (``user_id``, ``value``, …) → per-user running
    ``(n_events, sum_value_micros)`` changelog rows, one per touched user
    per micro-batch."""

    def update(key: tuple, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy(dtype=np.float64)
            s += int(np.round(v * VALUE_SCALE).astype(np.int64).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_micros": [s]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value_micros long",
        stateStructType="n long, s long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_stats(events: DataFrame) -> DataFrame:
    """The batch ground truth for :func:`running_user_stats`'s final state."""
    # bround = HALF_EVEN, matching numpy's np.round in the streaming path
    micros = F.bround(F.col("value").cast("double") * VALUE_SCALE).cast("long")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum(micros).alias("sum_value_micros")
    )
