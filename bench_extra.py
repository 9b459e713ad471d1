"""Per-subquery timing harness for optimization work (guide §1.4).

`bench.py` is frozen for measurement; this file exists so individual
component queries inside each bench family can be isolated with the noop
sink and timed / explained separately.  Usage:

    SPARK_GRAFT_CPUS=32 python bench_extra.py spatial_analytics
    SPARK_GRAFT_CPUS=32 python bench_extra.py relational_suite text_profile
    EXPLAIN=1 python bench_extra.py dedup_suite   # also dump .explain("formatted")

Prints one line per component: name, min seconds over BENCH_REPS timed
reps after one warm rep (same methodology as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

import bench  # reuses the frozen harness's corpus + session setup
from bench import CORPUS, DBSCAN_EPS, DBSCAN_MIN_PTS, N_TILES, SCALE, SF_DIR, _force, _t
from geotiff_scalable_analysis_pipeline_spark import datagen as dg

REPS = int(os.environ.get("BENCH_REPS", "2"))
EXPLAIN = os.environ.get("EXPLAIN", "0") == "1"
PLAN_DIR = os.environ.get("PLAN_DIR", "/root/repo/plans/r06")


def _components(spark, family):
    """Return {name: thunk} of independently timeable components."""
    if family == "spatial_analytics":
        from geotiff_scalable_analysis_pipeline_spark.operators import (
            corridor,
            dbscan as db,
            density,
            interpolate,
            raster as rop,
            spatial_stats,
            temporal,
        )

        p = _t(spark, "points")
        t = _t(spark, "tiles")
        obs = t.select(
            "cx",
            "cy",
            (dg.ihash_col(F.col("tile_k"), 41) % 10000).alias("v"),
            F.col("tile_k").alias("obs_id"),
        )
        cells = rop.tile_footprints(t, 6).select("media_ref", "cell")
        acq = t.select("media_ref", F.col("tile_k").cast("long").alias("ts_h")).join(
            cells, "media_ref"
        )
        mcells = (
            t.select(F.expr("cx div 4000").alias("ci"), F.expr("cy div 4000").alias("cj"))
            .groupBy("ci", "cj")
            .agg(F.count("*").alias("x"))
        )
        return {
            "dbscan": lambda: _force(db.dbscan(p, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)),
            "idw": lambda: _force(interpolate.idw(p, obs, radius=3000, oid="obs_id")),
            "gap_fill": lambda: _force(
                temporal.gap_fill_locf(
                    acq, start=0, stop=N_TILES, step=max(1, N_TILES // 50), keys=("cell",)
                )
            ),
            "kde": lambda: _force(density.kde_surface(p, cell=4000, radius=6000)),
            "morans": lambda: _force(spatial_stats.morans_i_components(mcells)),
            "local_moran": lambda: _force(spatial_stats.local_moran_components(mcells)),
            "corridor": lambda: _force(
                corridor.segment_distance_join(
                    p.select("q_id", "qx", "qy"),
                    dg.segments_df(spark, int(60 * SCALE)),
                    radius=3000,
                )
            ),
        }
    if family == "relational_suite":
        from geotiff_scalable_analysis_pipeline_spark import queries_relational as qr

        names = (
            "pricing_summary",
            "region_revenue_5way",
            "events_sessionization",
            "cohort_retention",
            "event_transitions",
            "skyline_parts",
            "basket_pairs",
        )
        return {n: (lambda n=n: _force(qr.QUERIES[n][0](spark, SF_DIR))) for n in names}
    if family == "text_profile":
        from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

        names = (
            "doc_repetition_stats",
            "vocab_heavy_hitters",
            "doc_keywords",
            "corpus_filter_pipeline",
            "bigram_pmi",
            "cm_sketch_estimates",
        )
        return {n: (lambda n=n: _force(qt.QUERIES[n][0](spark, SF_DIR))) for n in names}
    if family == "dedup_suite":
        from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

        names = ("minhash_lsh_pairs", "simhash_pairs", "embedding_topk")
        return {n: (lambda n=n: _force(qt.QUERIES[n][0](spark, SF_DIR))) for n in names}
    # whole-family fallthrough: time the frozen bench callable itself
    return {family: (lambda: bench.BENCHES_ALL[family](spark))}


def main():
    families = sys.argv[1:] or ["spatial_analytics"]
    spark = bench.get_spark("gsap-bench-extra")
    spark.range(1000).select(F.sum("id")).collect()
    bench.setup_corpus(spark, [f for f in families if f in bench.BENCH_TABLES])

    out = {}
    for fam in families:
        comps = _components(spark, fam)
        for name, thunk in comps.items():
            spark.sparkContext.setJobDescription(f"{fam}:{name}")
            thunk()  # warm
            best = None
            for _ in range(REPS):
                t0 = time.perf_counter()
                thunk()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[f"{fam}:{name}"] = round(best, 3)
            print(f"# {fam}:{name}: {best:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
