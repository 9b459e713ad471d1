"""Per-partition metrics table (north rule; reference analog: the
benchmarker's per-event durations, src/eo_core/benchmarker.py:113-160).

Operators instrumented with :func:`instrumented` emit one row per task
partition — (job_id, stage, partition_id, rows_in, rows_out, duration_ms) —
as small atomic JSON files under a metrics dir (the Delta/Iceberg txn-log
pattern: side-written small files on shared storage, readable as a table).
``metrics_table`` loads them back as a DataFrame for analysis/telemetry.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

METRIC_SCHEMA = (
    "job_id string, stage string, partition_id int, rows_in long, rows_out long, "
    "duration_ms double"
)


def emit(metrics_dir: str, job_id: str, stage: str, rows_in: int, rows_out: int, t0: float):
    """Called from inside a pandas UDF (executor side)."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx else -1
    attempt = ctx.taskAttemptId() if ctx else 0
    d = Path(metrics_dir)
    d.mkdir(parents=True, exist_ok=True)
    row = {
        "job_id": job_id,
        "stage": stage,
        "partition_id": pid,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "duration_ms": (time.perf_counter() - t0) * 1000.0,
    }
    p = d / f"{stage}-{pid}-{attempt}.json"
    tmp = p.with_suffix(f".tmp-{uuid.uuid4().hex}")
    tmp.write_text(json.dumps(row))
    os.replace(tmp, p)


def instrumented(fn, metrics_dir: str, job_id: str, stage: str):
    """Wrap a mapInPandas batch-iterator function with metrics emission."""

    def wrapper(batches):
        t0 = time.perf_counter()
        rows_in = rows_out = 0
        for pdf in batches:
            rows_in += len(pdf)
            for out in fn([pdf]):
                rows_out += len(out)
                yield out
        emit(metrics_dir, job_id, stage, rows_in, rows_out, t0)

    return wrapper


def metrics_table(spark: SparkSession, metrics_dir: str) -> DataFrame:
    files = sorted(Path(metrics_dir).glob("*.json"))
    rows = [json.loads(f.read_text()) for f in files]
    return spark.createDataFrame(rows, METRIC_SCHEMA) if rows else spark.createDataFrame([], METRIC_SCHEMA)


def stage_summary(m: DataFrame) -> DataFrame:
    """count/sum/mean/min/max per stage — the reference's event aggregation
    (benchmarker.py:117-126) as a groupBy."""
    from pyspark.sql import functions as F

    return m.groupBy("job_id", "stage").agg(
        F.count("*").alias("n_partitions"),
        F.sum("rows_in").alias("rows_in"),
        F.sum("rows_out").alias("rows_out"),
        F.sum("duration_ms").alias("sum_ms"),
        F.avg("duration_ms").alias("mean_ms"),
        F.min("duration_ms").alias("min_ms"),
        F.max("duration_ms").alias("max_ms"),
    )
