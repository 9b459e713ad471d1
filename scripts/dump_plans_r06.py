"""Dump .explain('formatted') for the round-6-touched query paths.

Usage:  python scripts/dump_plans_r06.py <outdir> <suffix> [name ...]
Run from the repo root whose code should be explained (the round-start
worktree for *_before.txt, the working tree for *_after.txt).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.getcwd())
import bench  # noqa: E402
from bench import _t, DBSCAN_EPS, DBSCAN_MIN_PTS, SCALE, SF_DIR  # noqa: E402
from geotiff_scalable_analysis_pipeline_spark import datagen as dg  # noqa: E402


def frames(spark):
    from geotiff_scalable_analysis_pipeline_spark.operators import (
        corridor,
        dbscan as db,
        interpolate,
    )
    from geotiff_scalable_analysis_pipeline_spark import (
        queries_relational as qr,
        queries_text as qt,
    )

    p = _t(spark, "points")
    t = _t(spark, "tiles")
    obs = t.select(
        "cx",
        "cy",
        (dg.ihash_col(F.col("tile_k"), 41) % 10000).alias("v"),
        F.col("tile_k").alias("obs_id"),
    )
    out = {
        "dbscan": lambda: db.dbscan(p, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS),
        "idw": lambda: interpolate.idw(p, obs, radius=3000, oid="obs_id"),
        "corridor": lambda: corridor.segment_distance_join(
            p.select("q_id", "qx", "qy"), dg.segments_df(spark, int(60 * SCALE)), radius=3000
        ),
    }
    for name in (
        "doc_keywords",
        "simhash_pairs",
        "minhash_lsh_pairs",
        "embedding_topk",
        "doc_repetition_stats",
        "cm_sketch_estimates",
        "vocab_heavy_hitters",
        "bigram_pmi",
        "corpus_filter_pipeline",
    ):
        out[name] = lambda n=name: qt.QUERIES[n][0](spark, SF_DIR)
    for name in (
        "pricing_summary",
        "region_revenue_5way",
        "events_sessionization",
        "cohort_retention",
        "event_transitions",
        "skyline_parts",
        "basket_pairs",
    ):
        out[name] = lambda n=name: qr.QUERIES[n][0](spark, SF_DIR)
    return out


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    spark = bench.get_spark("plan-dump")
    bench.setup_corpus(spark, ["spatial_analytics", "dbscan", "corridor"])
    os.makedirs(outdir, exist_ok=True)
    for name, thunk in frames(spark).items():
        if only and name not in only:
            continue
        df = thunk()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
