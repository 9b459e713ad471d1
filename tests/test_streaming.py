"""Structured Streaming surface (streaming/ingest.py, streaming/stateful.py):
streaming/batch parity, exactly-once checkpoint resume, watermark late-data
drop across restarts, cross-batch stateful operator."""

from __future__ import annotations

import datetime as dt
import os

import pyspark.sql.functions as F

from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
    hourly_event_stats_streaming,
    hourly_windowed_stats,
    incremental_parquet_ingest,
)
from geotiff_scalable_analysis_pipeline_spark.streaming.stateful import (
    batch_user_stats,
    running_user_stats,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_hourly_equals_batch(spark):
    """The windowed streaming aggregate equals the batch events_hourly query
    even when forced through one-file micro-batches."""
    from geotiff_scalable_analysis_pipeline_spark.queries_relational import q_events_hourly

    got = hourly_event_stats_streaming(
        spark, SF, query_name="t_stream_hourly", max_files_per_trigger=1
    )
    assert _rows(got) == _rows(q_events_hourly(spark, SF))


def test_incremental_ingest_exactly_once(spark, tmp_path):
    """Re-running the checkpointed ingest over a grown source directory
    processes only the NEW files — no duplicates, nothing missed."""
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    os.makedirs(src)
    base = spark.read.parquet(f"{SF}/events.parquet")
    schema = base.schema
    batch1 = base.filter(F.col("event_id") % 2 == 0)
    batch2 = base.filter(F.col("event_id") % 2 == 1)
    batch1.coalesce(1).write.parquet(src, mode="append")

    doubled = lambda df: df.withColumn("value", F.col("value") * 2)  # noqa: E731
    incremental_parquet_ingest(spark, src, sink, ckpt, transform=doubled, schema=schema)
    n1 = spark.read.parquet(sink).count()
    assert n1 == batch1.count()

    batch2.coalesce(1).write.parquet(src, mode="append")
    incremental_parquet_ingest(spark, src, sink, ckpt, transform=doubled, schema=schema)
    out = spark.read.parquet(sink)
    assert out.count() == base.count()  # batch1 NOT reprocessed
    assert out.select("event_id").distinct().count() == base.count()  # no dupes


def test_watermark_drops_late_rows_across_restart(spark, tmp_path):
    """Watermark state persists in the checkpoint: a row arriving in run 2
    below the run-1 watermark is dropped; open windows stay unemitted."""
    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    os.makedirs(src)
    d = dt.datetime(2024, 3, 1)

    def mk(rows, part):
        spark.createDataFrame(
            [(i, d + dt.timedelta(minutes=m), 1, "x", 1.0, "{}") for i, m in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.parquet(src, mode="append")

    def run():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        agg = hourly_windowed_stats(stream, watermark="30 minutes")
        q = (
            agg.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    # run 1: 10:05, 10:50, 12:00 → watermark 11:30 → [10:00,11:00) emitted
    mk([(1, 10 * 60 + 5), (2, 10 * 60 + 50), (3, 12 * 60)], 1)
    run()
    got1 = {(r["hour_bucket"] % 24, r["n"]) for r in spark.read.parquet(sink).collect()}
    assert got1 == {(10, 2)}

    # run 2: a LATE 10:20 row (below the checkpointed watermark — dropped)
    # and a 14:00 row (advances watermark to 13:30 → [12:00,13:00) emits;
    # [14:00,15:00) stays open, and the late row is in NO window).
    mk([(4, 10 * 60 + 20), (5, 14 * 60)], 2)
    run()
    got2 = {(r["hour_bucket"] % 24, r["n"]) for r in spark.read.parquet(sink).collect()}
    assert got2 == {(10, 2), (12, 1)}


def test_stateful_running_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-user state across micro-batches:
    the final changelog row per user equals the batch aggregate."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = spark.read.parquet(f"{SF}/events.parquet")
    for k in range(3):  # three files → three forced micro-batches
        base.filter(F.col("event_id") % 3 == k).coalesce(1).write.parquet(src, mode="append")

    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    name = "t_stateful_user_stats"
    spark.catalog.dropTempView(name)
    q = (
        running_user_stats(stream)
        .writeStream.trigger(availableNow=True)
        .outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.awaitTermination()
    # update-mode changelog: latest (= max n_events) row per user is current
    log = spark.table(name)
    final = (
        log.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value_micros")).alias("s"))
        .select("user_id", "s.n_events", "s.sum_value_micros")
    )
    assert _rows(final) == _rows(batch_user_stats(base))
    # state really spanned batches: some user must appear in >1 changelog row
    assert log.groupBy("user_id").count().filter("count > 1").count() > 0


def test_streaming_sessions_complete_equals_batch(spark):
    """session_window merges across forced one-file micro-batches in the
    state store: the complete-mode streaming result equals the batch
    session_window aggregate AND the lag()-based gaps-and-islands form."""
    from geotiff_scalable_analysis_pipeline_spark.queries_relational import (
        q_events_sessions_native,
    )
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        user_sessions_streaming,
    )

    got = user_sessions_streaming(
        spark, SF, query_name="t_stream_sessions", max_files_per_trigger=1
    )
    assert _rows(got) == _rows(q_events_sessions_native(spark, SF))


def test_streaming_sessions_append_emits_closed(spark, tmp_path):
    """The 100 TB shape: append mode + watermark emits exactly the sessions
    the watermark has CLOSED (end + nothing mergeable), evicting their
    state; open sessions stay unemitted."""
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        session_windows,
    )

    src, sink, ckpt = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "ckpt")
    os.makedirs(src)
    d = dt.datetime(2024, 3, 1)

    def mk(rows):
        spark.createDataFrame(
            [(i, d + dt.timedelta(minutes=m), u, "x", 1.0, "{}") for i, m, u in rows],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).coalesce(1).write.parquet(src, mode="append")

    def run():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        agg = session_windows(stream, "30 minutes", watermark="10 minutes")
        q = (
            agg.writeStream.trigger(availableNow=True)
            .outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()

    # user 1: events at 10:00, 10:10 (one session, ends 10:40);
    # user 2: event at 13:00 (session ends 13:30 — NOT closed by wm 12:50)
    mk([(1, 10 * 60, 1), (2, 10 * 60 + 10, 1), (3, 13 * 60, 2)])
    run()
    got1 = {(r["user_id"], r["n_events"]) for r in spark.read.parquet(sink).collect()}
    assert got1 == {(1, 2)}  # user 1's closed session only

    # a 15:00 user-2 event: new session (gap > 30 min), watermark → 14:50
    # closes the 13:00 session; the 15:00 one stays open.
    mk([(4, 15 * 60, 2)])
    run()
    got2 = {(r["user_id"], r["n_events"]) for r in spark.read.parquet(sink).collect()}
    assert got2 == {(1, 2), (2, 1)}


def test_streaming_dedup_state_spans_microbatches(spark, tmp_path):
    """streaming_dedup_exact's seen-set lives in the state store: a
    duplicate arriving in a LATER micro-batch (maxFilesPerTrigger=1, one
    file per batch) is dropped, and each distinct fingerprint is emitted
    exactly once."""
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        streaming_dedup_exact,
    )

    src = tmp_path / "docs"
    a = spark.createDataFrame(
        [("d1", "alpha"), ("d2", "beta"), ("d3", "alpha")], "doc_id string, text string"
    )
    b = spark.createDataFrame(
        [("d4", "alpha"), ("d5", "gamma"), ("d6", "beta")], "doc_id string, text string"
    )
    a.coalesce(1).write.parquet(str(src / "f1.parquet"))
    b.coalesce(1).write.parquet(str(src / "f2.parquet"))
    out = streaming_dedup_exact(
        spark,
        str(src),
        glob="*.parquet/*.parquet",
        query_name="t_stream_dedup",
        max_files_per_trigger=1,
    )
    got = sorted(r["text_md5"] for r in out.collect())
    import hashlib

    want = sorted(hashlib.md5(t.encode()).hexdigest() for t in ("alpha", "beta", "gamma"))
    assert got == want


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dedup_within_watermark (bounded-state dedup): duplicates inside the
    horizon are suppressed; a key's state is evicted at the END of the first
    batch whose watermark passes first_ts + horizon, so a duplicate in that
    SAME batch is still suppressed and one in a LATER batch re-emits."""
    import time

    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        dedup_within_watermark,
    )

    src = tmp_path / "ev"
    batches = [
        # A first-seen + in-horizon dup; C advances event time to 10:00
        [("A", "2024-01-01 00:00:00"), ("A", "2024-01-01 00:10:00"),
         ("B", "2024-01-01 00:05:00"), ("C", "2024-01-01 10:00:00")],
        # wm=09:00 > A's expiry 01:00, but eviction runs at batch END:
        # this A is still suppressed
        [("A", "2024-01-01 10:01:00")],
        # state evicted -> fresh first-seen, re-emitted
        [("A", "2024-01-01 10:02:00")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, ts string").coalesce(1).write.parquet(
            str(src / f"f{i}.parquet")
        )
        time.sleep(1.1)  # file-source orders batches by mtime
    st = (
        spark.readStream.schema("k string, ts string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet/*.parquet")
    )
    out = dedup_within_watermark(st, ["k"], "1 hour")
    q = (
        out.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("memory")
        .queryName("t_wm_dedup")
        .start()
    )
    q.awaitTermination()
    got = sorted((r.k, str(r.ts)) for r in spark.table("t_wm_dedup").collect())
    assert got == [
        ("A", "2024-01-01 00:00:00"),
        ("A", "2024-01-01 10:02:00"),
        ("B", "2024-01-01 00:05:00"),
        ("C", "2024-01-01 10:00:00"),
    ]


def test_stream_stream_interval_join_semantics(spark, tmp_path):
    """interval_attribution_join (stream-stream): an in-horizon match is
    emitted whether the right row arrives in the SAME batch or a LATER one
    (left state persists across batches). Eviction timing: the watermark
    only incorporates batch N's event times at the END of batch N, and state
    cleanup runs at batch end — so a right row arriving in the batch where
    the watermark FIRST exceeds left_ts + horizon still matches (one-batch
    grace, same rule test_dedup_within_watermark_bounded_state pins for
    dedup state), while one arriving in the NEXT batch does not."""
    import time

    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        interval_attribution_join,
    )

    cdir, pdir = tmp_path / "clicks", tmp_path / "purch"
    click_batches = [
        [(100, 1, "2024-01-01 00:00:00")],  # the attributable click
        [(101, 7, "2024-01-01 00:05:00")],  # filler (no purchases for u7)
        [(102, 99, "2024-01-01 10:00:00")],  # advances clicks-side watermark
        [(103, 98, "2024-01-01 10:01:00")],  # filler
        [(104, 97, "2024-01-01 10:02:00")],  # filler
    ]
    purchase_batches = [
        [(200, 1, "2024-01-01 00:30:00")],  # same-batch match (lag 30 min)
        [(201, 1, "2024-01-01 00:50:00")],  # CROSS-batch match (lag 50 min)
        [(202, 50, "2024-01-01 10:00:00")],  # advances purchases-side watermark
        # batch 3 runs under wm = min(10:00, 10:00) - 10 min = 09:50, which
        # exceeds click 100's expiry 01:00 — but eviction runs at batch END,
        # so this in-horizon purchase still matches (one-batch grace):
        [(203, 1, "2024-01-01 00:55:00")],
        # batch 4: state evicted -> in-horizon but NOT emitted
        [(204, 1, "2024-01-01 00:56:00")],
    ]
    schema = "event_id long, user_id long, ts string"
    for i in range(5):
        for d, rows in ((cdir, click_batches[i]), (pdir, purchase_batches[i])):
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(d / f"f{i}.parquet")
            )
        time.sleep(1.1)  # file-source orders batches by mtime

    def rd(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/*.parquet/*.parquet")
        )

    out = interval_attribution_join(
        rd(cdir), rd(pdir), horizon="1 hour", watermark="10 minutes"
    )
    q = (
        out.writeStream.trigger(availableNow=True)
        .outputMode("append")
        .format("memory")
        .queryName("t_ssj")
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.left_id, r.right_id, r.user_id, r.lag_us)
        for r in spark.table("t_ssj").collect()
    )
    assert got == [
        (100, 200, 1, 1_800_000_000),
        (100, 201, 1, 3_000_000_000),
        (100, 203, 1, 3_300_000_000),
    ]


def test_streaming_query_registered_in_driver_contract():
    import __spark_entry__ as entrymod

    for name in ("streaming_events_hourly", "streaming_events_sessions",
                 "events_sessions_native"):
        assert name in entrymod.queries()
        assert name in entrymod.oracle_sql()


def test_stream_to_catalog_exactly_once(spark, tmp_path):
    """foreachBatch -> catalog sink: each micro-batch is one append snapshot;
    a replayed epoch (crash between catalog commit and checkpoint commit,
    simulated via a fresh checkpoint over the same source) is skipped by the
    manifest's stream_batch_id — even when a compact() ran in between."""
    from geotiff_scalable_analysis_pipeline_spark.plans.catalog import TableCatalog
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import stream_to_catalog

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    base = spark.read.parquet(f"{SF}/events.parquet")
    schema = base.schema
    base.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src, mode="append")

    cat = TableCatalog(tmp_path / "cat")

    def run(checkpoint):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        stream_to_catalog(stream, cat, "ev", checkpoint)

    run(ckpt)
    n_even = base.filter(F.col("event_id") % 2 == 0).count()
    assert cat.read(spark, "ev").count() == n_even
    man = cat.manifest("ev")
    assert man["stream_batch_id"] == 0

    # new data -> one more snapshot, old data NOT reprocessed
    base.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src, mode="append")
    run(ckpt)
    assert cat.read(spark, "ev").count() == base.count()
    assert cat.read(spark, "ev").select("event_id").distinct().count() == base.count()
    assert cat.manifest("ev")["stream_batch_id"] == 1

    # maintenance compaction between stream epochs (no stream_batch_id on its
    # own manifest) must not erase the epoch marker for the replay guard
    cat.compact(spark, "ev", target_file_bytes=1 << 30)
    assert "stream_batch_id" not in cat.manifest("ev")
    # the per-stream high-water dict is propagated onto EVERY descendant
    assert cat.manifest("ev")["stream_high_water"] == {"default": 1}

    # expire the ancestor manifests that carried the stream_batch_id: the
    # replay guard must still hold (regression: the parent-chain walk hit
    # the expired manifest, returned -1, and re-committed replayed epochs
    # -> duplicate rows)
    cat.expire("ev", keep_last=1)
    assert cat.snapshots("ev") == [cat.current_snapshot("ev")]

    # replay: fresh checkpoint re-delivers batches 0..1 -> both skipped
    run(str(tmp_path / "ckpt2"))
    assert cat.read(spark, "ev").count() == base.count()
    assert cat.read(spark, "ev").select("event_id").distinct().count() == base.count()


def test_stream_to_catalog_fresh_checkpoint_new_batching(spark, tmp_path):
    """File-granularity replay guard: a FRESH checkpoint whose micro-batch
    decomposition differs from the original run's must neither lose
    never-committed files nor duplicate committed ones.

    Regression: the batch-id-only guard dropped batch 0 of a fresh
    checkpoint (0 <= recorded high water) even when that batch packed NEW
    files together with the replayed ones — the new files were then marked
    processed in the new checkpoint and permanently lost."""
    from geotiff_scalable_analysis_pipeline_spark.plans.catalog import TableCatalog
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import stream_to_catalog

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = spark.read.parquet(f"{SF}/events.parquet")
    schema = base.schema
    cat = TableCatalog(tmp_path / "cat")

    def run(checkpoint, max_files):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(src)
        )
        stream_to_catalog(stream, cat, "ev", str(tmp_path / checkpoint))

    # run 1: two files, one per batch (high water -> 1)
    base.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(src, mode="append")
    base.filter(F.col("event_id") % 3 == 1).coalesce(1).write.parquet(src, mode="append")
    run("ck1", 1)
    n01 = base.filter(F.col("event_id") % 3 < 2).count()
    assert cat.read(spark, "ev").count() == n01

    # checkpoint lost; a NEW file lands; the fresh checkpoint packs ALL
    # THREE files into batch 0 (0 <= high water 1): only the new file's
    # rows must commit
    base.filter(F.col("event_id") % 3 == 2).coalesce(1).write.parquet(src, mode="append")
    run("ck2", 10)
    got = cat.read(spark, "ev")
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == base.count()

    # opposite decomposition skew: fresh checkpoint, one file per batch
    # (batch ids 0..2, the last ABOVE the recorded high water) — no
    # duplicates either
    run("ck3", 1)
    assert cat.read(spark, "ev").count() == base.count()


def test_streaming_raster_metrics_pipeline(spark, tmp_path):
    """The raster pipeline runs INCREMENTALLY over streaming media ingest:
    readStream(media parquet) → chunk probability cubes → per-pixel metric
    payloads (two stateless mapInPandas stages — legal in streaming) →
    exactly-once catalog commits. The streamed table must be bit-identical
    to the batch pipeline over the same media, and a second ingest pass
    must process only the new files."""
    from geotiff_scalable_analysis_pipeline_spark import datagen as dg
    from geotiff_scalable_analysis_pipeline_spark.operators import chunking
    from geotiff_scalable_analysis_pipeline_spark.plans.catalog import TableCatalog
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import stream_to_catalog

    cfg = dg.GoldenConfig(n_tiles=4, tile_px=64, n_media_tiles=4)
    zor, halo, patch, stride = 32, 8, 16, 8
    media = dg.media_df(spark, cfg)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    half = F.substring("media_ref", 5, 8).cast("long") % 2
    media.filter(half == 0).coalesce(1).write.parquet(src, mode="append")

    cat = TableCatalog(tmp_path / "cat")

    def run(checkpoint):
        stream = (
            spark.readStream.schema(media.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        metrics = chunking.chunk_metric_payloads(
            chunking.chunk_prob_payloads(stream, zor=zor, halo=halo, patch=patch, stride=stride)
        )
        stream_to_catalog(metrics, cat, "chunk_metrics", checkpoint,
                          partition_by=["media_ref"])

    run(ckpt)
    assert cat.read(spark, "chunk_metrics").count() == 2 * 4  # 2 tiles × 4 chunks

    # second half arrives → only the new files are processed
    media.filter(half == 1).coalesce(1).write.parquet(src, mode="append")
    run(ckpt)
    streamed = cat.read(spark, "chunk_metrics")
    assert streamed.count() == 4 * 4

    # bit-identical to the batch pipeline on the same media
    batch = chunking.chunk_metric_payloads(
        chunking.chunk_prob_payloads(media, zor=zor, halo=halo, patch=patch, stride=stride)
    )
    key = ["media_ref", "chunk_r", "chunk_c"]
    cols = key + ["h", "w", "class_payload", "conf_payload", "entr_payload", "gap_payload"]
    got = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r)
                 for r in streamed.select(*cols).collect())
    want = sorted(tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r)
                  for r in batch.select(*cols).collect())
    assert got == want

    # replay with a fresh checkpoint: every epoch is skipped by the manifest
    # stream_batch_id guard — no duplicate chunks
    run(str(tmp_path / "ckpt2"))
    assert cat.read(spark, "chunk_metrics").count() == 4 * 4


def test_two_pipelines_one_table_need_distinct_stream_ids(spark, tmp_path):
    """The replay guard is namespaced per stream_id: a SECOND logical
    pipeline (fresh checkpoint, batch ids restarting at 0) appending to the
    same table must not have its epochs mistaken for replays of the first
    pipeline's — under a distinct stream_id its rows land; each stream's
    own replay is still skipped."""
    from geotiff_scalable_analysis_pipeline_spark.plans.catalog import TableCatalog
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import stream_to_catalog

    base = spark.read.parquet(f"{SF}/events.parquet")
    schema = base.schema
    src_a, src_b = str(tmp_path / "a"), str(tmp_path / "b")
    base.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(src_a)
    base.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(src_b)
    n_a = base.filter(F.col("event_id") % 2 == 0).count()

    cat = TableCatalog(tmp_path / "cat")

    def run(src, ckpt, sid):
        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        stream_to_catalog(stream, cat, "ev", str(tmp_path / ckpt), stream_id=sid)

    run(src_a, "ck_a", "pipeline-a")
    assert cat.read(spark, "ev").count() == n_a
    # second pipeline, fresh checkpoint, batch ids restart at 0 — its own
    # stream_id means its epochs commit instead of being dropped as replays
    run(src_b, "ck_b", "pipeline-b")
    assert cat.read(spark, "ev").count() == base.count()
    hw = cat.manifest("ev")["stream_high_water"]
    assert hw == {"pipeline-a": 0, "pipeline-b": 0}
    # each stream's OWN replay (fresh checkpoint, same source) is still a no-op
    run(src_a, "ck_a2", "pipeline-a")
    run(src_b, "ck_b2", "pipeline-b")
    assert cat.read(spark, "ev").count() == base.count()
    assert cat.read(spark, "ev").select("event_id").distinct().count() == base.count()


def test_stream_static_join_spans_microbatches(spark, tmp_path):
    """Stream-static enrichment: the broadcast dim joins correctly in EVERY
    micro-batch (events split across two one-file batches), and the final
    aggregate equals the batch join."""
    from geotiff_scalable_analysis_pipeline_spark.streaming.ingest import (
        stream_static_enrichment,
    )

    base = str(tmp_path / "sf")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        f"{base}/events.parquet"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        f"{base}/events.parquet", mode="append"
    )
    dim = spark.read.parquet(f"{SF}/customer.parquet")
    dim.coalesce(1).write.parquet(f"{base}/customer.parquet")

    got = stream_static_enrichment(
        spark, base, query_name="t_ss_enrich", max_files_per_trigger=1
    )
    want = (
        ev.join(dim, ev.user_id == dim.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    assert _rows(got) == _rows(want)
