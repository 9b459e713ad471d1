"""geotiff_scalable_analysis_pipeline_spark — PySpark-native spatial-join + tiling engine.

A brand-new engine (NOT a port) re-creating the analysis capabilities of the
reference repo rvardiashvili/GeoTiff-Scalable-Analysis-Pipeline on Apache Spark:

* interleaved text+media document corpus (``doc_id, spans[]``) as the primary table
* GeoTIFF tile payloads decoded inside vectorized Arrow/pandas UDFs
* Morton/quad cell index (H3/S2-style) over a planar frame
* broadcast + salted point-in-polygon joins, cell-bucketed kNN ring expansion
* per-tile pixel statistics, zonal aggregation, sinusoidal overlap-add
* raster→vector polygonization and vector→raster masking
* quadtree tile pyramid persisted as partitioned Parquet with snapshot/lineage
  metadata (Iceberg *semantics*; no Java Iceberg runtime in this sandbox)

Everything is DataFrame-first: pure Column expressions where Catalyst can
whole-stage-codegen them, Arrow-batched pandas UDFs (``mapInPandas`` /
``applyInPandas``) where per-pixel numpy is required. No per-row Python UDFs,
no RDD API.
"""

__version__ = "0.1.0"
