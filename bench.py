"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Headline: the north-rule metric — tiles+docs/sec for the cell-indexed PIP
join + zonal stats pipeline over the interleaved corpus — plus the other
engine surfaces (kNN, pyramid, raster decode+stats, chunk/overlap-add
pipeline) and the relational suite at $SPARK_GRAFT_SF_DIR.

Scaling-efficiency evidence (N vs 4N parallelism) is produced separately by
BENCH/run_scaling.py, which shells out to this file at local[8] / local[32].

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default all cores)
  BENCH_SCALE          multiplier for the synthetic corpus (default 1.0)
  BENCH_ONLY           comma-separated subset of query names
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import (
    chunking,
    knn,
    pip_join,
    raster,
    spans,
    zonal,
)
from geotiff_scalable_analysis_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = float(os.environ.get("BENCH_SCALE", "1.0"))

# bench-scale synthetic corpus (independent of the correctness golden sizes)
N_TILES = int(20_000 * SCALE)
N_DOCS = int(100_000 * SCALE)
N_POINTS = int(5_000 * SCALE)
N_MEDIA = int(1_000 * SCALE)  # payload-bearing tiles (128px × 4 bands ≈ 128 KiB each)
MEDIA_PX = 128

CFG = dg.GoldenConfig(
    n_tiles=N_TILES, n_docs=N_DOCS, n_points=N_POINTS, n_media_tiles=N_MEDIA, tile_px=MEDIA_PX
)


def _force(df):
    """Fully materialize a DataFrame without driver collect."""
    df.write.format("noop").mode("overwrite").save()


def bench_pip_zonal(spark):
    """North-rule headline: interleaved docs → media spans → PIP join (rect +
    poly) → zonal stats. Work unit count = tiles + docs."""
    docs = dg.documents_df(spark, CFG)
    m = spans.media_spans(docs)
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join(
        t, dg.rect_zones_df(spark, CFG), dg.poly_zones_df(spark, CFG), x="cx", y="cy"
    )
    per_zone = (
        m.join(pairs.select("media_ref", "zone_id"), "media_ref")
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_spans"), F.countDistinct("doc_id").alias("n_docs"))
    )
    _force(per_zone)
    return N_TILES + N_DOCS


def bench_knn(spark):
    out = knn.knn_join(dg.points_df(spark, CFG), dg.tiles_df(spark, CFG), k=5)
    _force(out)
    return N_POINTS


def bench_pyramid(spark):
    from geotiff_scalable_analysis_pipeline_spark.queries_spatial import q_pyramid_rollup
    from geotiff_scalable_analysis_pipeline_spark.functions.cells import parent_col

    base = raster.tile_footprints(dg.tiles_df(spark, CFG), 8).select("media_ref", "cell")
    levels = [base.groupBy("cell").agg(F.count("*").alias("n_tiles"))]
    cur = base
    for _ in range(4):
        cur = cur.select("media_ref", parent_col(F.col("cell")).alias("cell")).distinct()
        levels.append(cur.groupBy("cell").agg(F.count("*").alias("n_tiles")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    _force(out)
    return N_TILES


def bench_raster_stats(spark):
    """Decode throughput: N_MEDIA GeoTIFF blobs → pixel stats + histograms."""
    media = dg.media_df(spark, CFG).persist()
    _force(raster.tile_pixel_stats(media))
    _force(raster.tile_histogram(media))
    media.unpersist()
    return N_MEDIA


def bench_chunk_pipeline(spark):
    cfg = dg.GoldenConfig(n_tiles=max(64, int(256 * SCALE)), tile_px=MEDIA_PX,
                          n_media_tiles=max(64, int(256 * SCALE)))
    media = dg.media_df(spark, cfg)
    stats = chunking.chunk_class_stats(media, zor=64, halo=16, patch=32, stride=16)
    _force(chunking.global_class_probs(stats))
    return cfg.n_media_tiles


def bench_relational(spark):
    from geotiff_scalable_analysis_pipeline_spark import queries_relational as qr

    for name in ("pricing_summary", "region_revenue_5way", "events_sessionization"):
        _force(qr.QUERIES[name][0](spark, SF_DIR))
    return 0


BENCHES = {
    "pip_zonal": bench_pip_zonal,
    "knn": bench_knn,
    "pyramid_rollup": bench_pyramid,
    "raster_stats": bench_raster_stats,
    "chunk_pipeline": bench_chunk_pipeline,
    "relational_suite": bench_relational,
}


def main():
    only = os.environ.get("BENCH_ONLY")
    names = only.split(",") if only else list(BENCHES)
    spark = get_spark("gsap-bench")
    # warm the JVM + python workers so per-query times measure the queries
    spark.range(1000).select(F.sum("id")).collect()

    times: dict[str, float] = {}
    units = 0
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        u = BENCHES[name](spark)
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt
        units += u or 0
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    line = {
        "metric": "pip_zonal_suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "tiles_plus_docs": N_TILES + N_DOCS,
        "throughput_tiles_docs_per_sec": round((N_TILES + N_DOCS) / times["pip_zonal"], 1)
        if "pip_zonal" in times
        else None,
        "parallelism": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
