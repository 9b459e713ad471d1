"""Benchmark harness — prints ONE JSON line the driver records as BENCH_r{N}.json.

Headline: the north-rule metric — tiles+docs/sec for the cell-indexed PIP
join + zonal stats pipeline over the interleaved corpus — plus the other
engine surfaces (kNN, pyramid, raster decode+stats, chunk/overlap-add
pipeline, dedup) and the relational suite at $SPARK_GRAFT_SF_DIR.

Method: a SETUP phase (untimed) materializes the deterministic corpus to
parquet once per scale — benchmarked queries then *scan parquet* like a real
deployment (pushdown + pruning measurable), instead of re-running the
in-plan generators whose giant codegen expressions would dominate timing.
Each query runs twice; the second (steady-state) time is reported.

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default all cores)
  BENCH_SCALE          corpus multiplier (default 1.0)
  BENCH_ONLY           comma-separated subset of query names
  BENCH_TMP            corpus cache dir (default /tmp/gsap_bench)
  BENCH_STEADY         0 → single run per query (default 1 = warm + timed)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

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
STEADY = os.environ.get("BENCH_STEADY", "1") == "1"
REPS = int(os.environ.get("BENCH_REPS", "1"))  # timed reps; min reported (noise-robust)

N_TILES = int(20_000 * SCALE)
N_DOCS = int(100_000 * SCALE)
N_POINTS = int(5_000 * SCALE)
N_MEDIA = int(1_000 * SCALE)  # payload-bearing tiles (128px × 4 bands ≈ 128 KiB each)
MEDIA_PX = 128

CFG = dg.GoldenConfig(
    n_tiles=N_TILES, n_docs=N_DOCS, n_points=N_POINTS, n_media_tiles=N_MEDIA, tile_px=MEDIA_PX
)
CORPUS = Path(os.environ.get("BENCH_TMP", "/tmp/gsap_bench")) / f"scale_{SCALE}"


def setup_corpus(spark):
    """Materialize the deterministic corpus to parquet (once per scale)."""
    done = CORPUS / "_READY"
    if done.exists():
        return
    CORPUS.mkdir(parents=True, exist_ok=True)
    dg.tiles_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "tiles"))
    dg.rect_zones_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "rect_zones"))
    dg.poly_zones_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "poly_zones"))
    dg.points_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "points"))
    dg.documents_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "documents"))
    dg.media_df(spark, CFG).write.mode("overwrite").parquet(str(CORPUS / "media"))
    done.write_text("ok")


def _t(spark, name):
    return spark.read.parquet(str(CORPUS / name))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def bench_pip_zonal(spark):
    """North-rule headline: interleaved docs → media spans → PIP join (rect +
    poly) → zonal doc rollup. Work units = tiles + docs.

    Plan choices that matter (measured on this VM at BENCH_SCALE=10):
    * long surrogate join keys derived in-plan from the string refs — string
      hash/compare through join+agg cost ~1.8× (15.8s → 8.9s at 2 cores);
    * two-phase distinct (groupBy(zone, doc) → groupBy(zone)) instead of
      countDistinct's expand — one narrow shuffle, no row doubling;
    * shuffle_hash hint on the pairs side: in local mode a broadcast build
      (which would embed the Python ray-cast stage) serializes on the
      driver — shuffle parallelizes (8.6→3.2s at 8 cores, efficiency 0.68).
      On a real cluster with a 10^12-row fact side the broadcast becomes
      right again; the hint is a bench-scale physical choice, same plan
      semantics.
    """
    m = spans.media_spans(_t(spark, "documents"))
    t = _t(spark, "tiles").select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join(
        t, _t(spark, "rect_zones"), _t(spark, "poly_zones"), x="cx", y="cy"
    )
    mk = m.select(
        F.substring("media_ref", 5, 8).cast("long").alias("tk"),
        F.substring("doc_id", 4, 10).cast("long").alias("dk"),
    )
    pk = pairs.select(F.substring("media_ref", 5, 8).cast("long").alias("tk"), "zone_id")
    per_zone = (
        mk.join(pk.hint("shuffle_hash"), "tk")
        .groupBy("zone_id", "dk")
        .agg(F.count("*").alias("c"))
        .groupBy("zone_id")
        .agg(F.sum("c").alias("n_spans"), F.count("*").alias("n_docs"))
    )
    _force(per_zone)
    return N_TILES + N_DOCS


def bench_knn(spark):
    _force(knn.knn_join(_t(spark, "points"), _t(spark, "tiles"), k=5))
    return N_POINTS


def bench_pyramid(spark):
    from geotiff_scalable_analysis_pipeline_spark.functions.cells import parent_col

    base = raster.tile_footprints(_t(spark, "tiles"), 8).select("media_ref", "cell")
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
    media = _t(spark, "media")
    _force(raster.tile_pixel_stats(media))
    _force(raster.tile_histogram(media))
    return N_MEDIA


def bench_chunk_pipeline(spark):
    media = _t(spark, "media").limit(max(64, int(256 * SCALE)))
    stats = chunking.chunk_class_stats(media, zor=64, halo=16, patch=32, stride=16)
    _force(chunking.global_class_probs(stats))
    return max(64, int(256 * SCALE))


def bench_zonal_stats(spark):
    t = _t(spark, "tiles").select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join_rect(t, _t(spark, "rect_zones"), x="cx", y="cy")
    stats = raster.tile_pixel_stats(_t(spark, "media"))
    _force(zonal.two_stage_zonal(pairs, stats))
    return N_MEDIA


def bench_dedup(spark):
    from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

    for name in ("minhash_lsh_pairs", "simhash_pairs", "embedding_topk"):
        _force(qt.QUERIES[name][0](spark, SF_DIR))
    return 0


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
    "zonal_stats": bench_zonal_stats,
    "dedup_suite": bench_dedup,
    "relational_suite": bench_relational,
}


def main():
    only = os.environ.get("BENCH_ONLY")
    names = only.split(",") if only else list(BENCHES)
    spark = get_spark("gsap-bench")
    spark.range(1000).select(F.sum("id")).collect()
    setup_corpus(spark)

    times: dict[str, float] = {}
    units = 0
    total = 0.0
    for name in names:
        fn = BENCHES[name]
        if STEADY:
            fn(spark)  # warm: codegen compiled, workers spawned, cache hot
        best = None
        u = 0
        for _ in range(REPS):
            t0 = time.perf_counter()
            u = fn(spark)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        dt = best
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
        "steady_state": STEADY,
    }
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
