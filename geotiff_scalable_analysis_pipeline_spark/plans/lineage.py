"""Per-partition lineage + checkpoint-resume (north rule).

The reference survives writer-process death by detecting it and restarting
(reference: src/eo_core/process.py:530-536, 571-576); the Spark-native analog
is *semantic* resume: work is split into deterministic partition keys, each
key's output commits atomically with a lineage marker, and a re-run
``left_anti``-joins the already-committed keys so only missing work executes.
Re-runs are idempotent and the final table is byte-identical to an
uninterrupted run (tests/test_resume.py proves this with a mid-job kill).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageLog:
    """Append-only per-key commit log under ``root/_lineage/<job_id>/``.

    One marker file per committed key (atomic rename) — the same pattern at
    cluster scale with an object store (marker PUT is the commit point).
    """

    def __init__(self, root: str | Path, job_id: str):
        self.dir = Path(root) / "_lineage" / job_id
        self.dir.mkdir(parents=True, exist_ok=True)

    def committed_keys(self) -> list[str]:
        return sorted(p.stem for p in self.dir.glob("*.done"))

    def is_committed(self, key: str) -> bool:
        return (self.dir / f"{key}.done").exists()

    def commit_key(self, key: str, meta: dict | None = None) -> None:
        p = self.dir / f"{key}.done"
        tmp = p.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(meta or {}))
        os.replace(tmp, p)

    def as_df(self, spark: SparkSession) -> DataFrame:
        keys = [(k,) for k in self.committed_keys()]
        return spark.createDataFrame(keys or [], "key string")


def run_resumable(
    spark: SparkSession,
    keys: DataFrame,
    key_col: str,
    process_key: Callable[[str], None],
    log: LineageLog,
    fail_after: int | None = None,
    max_parallel_keys: int = 1,
) -> dict:
    """Process every key not yet committed; returns {processed, skipped}.

    ``keys`` is the full deterministic work list; already-committed keys are
    removed with a left_anti join (tiny lineage side → broadcast). Each key is
    processed then committed; a crash between the two re-runs that key only
    (process_key must therefore be idempotent — write-then-rename).
    ``fail_after`` injects a crash for the resume test.

    Each key is one-or-more Spark jobs, so executors already parallelize
    *within* a key. ``max_parallel_keys > 1`` additionally overlaps
    independent keys via driver threads (Spark's scheduler is thread-safe;
    FIFO across concurrently-submitted jobs) — use when keys are coarse
    enough that a single key can't saturate the cluster. Key commits stay
    independent, so crash-resume semantics are unchanged.
    """
    done = log.as_df(spark).withColumnRenamed("key", key_col)
    todo = (
        keys.select(F.col(key_col).cast("string").alias(key_col))
        .distinct()
        .join(F.broadcast(done), key_col, "left_anti")
        .orderBy(key_col)
    )
    todo_keys = [r[0] for r in todo.collect()]
    skipped = keys.select(key_col).distinct().count() - len(todo_keys)
    if max_parallel_keys > 1 and fail_after is None:
        from concurrent.futures import ThreadPoolExecutor

        def one(k: str) -> None:
            process_key(k)
            log.commit_key(k)

        with ThreadPoolExecutor(max_workers=max_parallel_keys) as pool:
            list(pool.map(one, todo_keys))  # re-raises the first failure
        return {"processed": len(todo_keys), "skipped": skipped}
    for i, k in enumerate(todo_keys):
        if fail_after is not None and i >= fail_after:
            raise RuntimeError(f"injected failure before key {k}")
        process_key(k)
        log.commit_key(k)
    return {"processed": len(todo_keys), "skipped": skipped}
