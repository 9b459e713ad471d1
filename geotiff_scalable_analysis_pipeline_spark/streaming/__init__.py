"""Streaming stance (SURVEY.md §2.9) — deliberate non-goal.

The reference is a batch pipeline; its queues are *pipelining* (bounded
``prefetch_queue``/``writer_queue`` with a ``None``-sentinel EOF and blocking
``put`` backpressure — reference src/eo_core/process.py:429-523), not
event-time streaming: no watermarks, no late data, no session windows.

The engine therefore exposes no Structured Streaming surface. The north
rule's continuity requirements are met batch-natively:

* incremental ingest — new corpus snapshots commit via plans/catalog.py;
  downstream jobs process only keys absent from the lineage log
  (plans/lineage.py ``left_anti`` resume), i.e. micro-batch semantics with
  exactly-once per-partition commits;
* backpressure — Spark's own scheduling: partition count bounds in-flight
  work exactly as the reference's queue sizes did.

If true event-time streams were ever needed, the operators here lift
directly: ``readStream`` → the same pure-Column cell/calibration exprs →
``applyInPandasWithState`` for per-tile accumulation — but nothing in the
reference's capability surface requires it.
"""
