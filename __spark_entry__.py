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


def _catalogue() -> dict[str, tuple]:
    from geotiff_scalable_analysis_pipeline_spark import queries_relational, queries_spatial

    cat: dict[str, tuple] = {}
    cat.update(queries_spatial.QUERIES)
    cat.update(queries_relational.QUERIES)
    try:  # added incrementally; keep the contract importable mid-build
        from geotiff_scalable_analysis_pipeline_spark import queries_text

        cat.update(queries_text.QUERIES)
    except ImportError:
        pass
    try:
        from geotiff_scalable_analysis_pipeline_spark import queries_multimodal

        cat.update(queries_multimodal.QUERIES)
    except ImportError:
        pass
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
