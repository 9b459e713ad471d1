"""spark-submit entry point (north rule: jobs run via ``spark-submit
--py-files``).

Usage:
    cd /root/repo && python scripts/package.py   # builds dist/gsap_spark.zip
    spark-submit --master local[8] \
        --py-files dist/gsap_spark.zip \
        scripts/run_job.py --job zonal --out /tmp/gsap_out

Jobs are resumable: each re-run anti-joins the lineage log and only processes
missing partition keys.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--job", default="zonal", choices=["zonal", "pip", "knn", "pyramid", "report"]
    )
    ap.add_argument("--out", default="/tmp/gsap_out")
    ap.add_argument("--n-tiles", type=int, default=2000)
    args = ap.parse_args()

    # Session comes from spark-submit's conf; only app-level imports here so
    # the zip on --py-files is the import source on executors.
    spark = SparkSession.builder.getOrCreate()
    from pyspark.sql import functions as F

    from geotiff_scalable_analysis_pipeline_spark import datagen as dg
    from geotiff_scalable_analysis_pipeline_spark.operators import knn, pip_join, raster, zonal
    from geotiff_scalable_analysis_pipeline_spark.plans.catalog import TableCatalog
    from geotiff_scalable_analysis_pipeline_spark.plans.pyramid import build_pyramid

    cfg = dg.GoldenConfig(n_tiles=args.n_tiles)
    cat = TableCatalog(args.out)
    tiles = dg.tiles_df(spark, cfg)

    if args.job == "pip":
        out = pip_join.pip_join(
            tiles.select("media_ref", "cx", "cy"),
            dg.rect_zones_df(spark, cfg),
            dg.poly_zones_df(spark, cfg),
            x="cx",
            y="cy",
        )
        snap = cat.commit(out, "pip_pairs", mode="overwrite")
    elif args.job == "zonal":
        pairs = pip_join.pip_join_rect(
            tiles.select("media_ref", "cx", "cy"), dg.rect_zones_df(spark, cfg), x="cx", y="cy"
        )
        stats = raster.tile_pixel_stats(dg.media_df(spark, cfg))
        out = zonal.two_stage_zonal(pairs, stats)
        snap = cat.commit(out, "zonal_stats", mode="overwrite")
    elif args.job == "knn":
        out = knn.knn_join(dg.points_df(spark, cfg), tiles, k=cfg.knn_k)
        snap = cat.commit(out, "knn", mode="overwrite")
    elif args.job == "report":
        # The reference's full product flow end-to-end (process.py →
        # reporters → generate_viewer): probability cubes per chunk →
        # catalog snapshot → per-pixel metric rasters → K1 GeoTIFF sinks →
        # K4 PNG previews → K6 self-contained dashboard.
        import numpy as np

        from geotiff_scalable_analysis_pipeline_spark.operators import chunking
        from geotiff_scalable_analysis_pipeline_spark.sources import preview, sinks

        mcfg = dg.GoldenConfig(
            n_tiles=min(args.n_tiles, 16), tile_px=64,
            n_media_tiles=min(args.n_tiles, 16),
        )
        media = dg.media_df(spark, mcfg)
        probs = chunking.chunk_prob_payloads(media, zor=32, halo=8, patch=16, stride=8)
        snap = cat.commit(probs, "prob_chunks", partition_by=["media_ref"])
        metrics = chunking.chunk_metric_payloads(cat.read(spark, "prob_chunks"))
        tl = dg.tiles_np(mcfg)
        meta = {
            str(tl["media_ref"][k]): (mcfg.tile_px, mcfg.tile_px, float(mcfg.px_size),
                                      float(tl["x0"][k]), float(tl["y1"][k]))
            for k in range(mcfg.n_media_tiles)
        }
        written = sinks.export_metric_geotiffs(metrics, meta, args.out)
        nc = mcfg.n_bands
        colors = (np.arange(nc * 3, dtype=np.int64) * 37 % 256).astype("uint8").reshape(nc, 3)
        tile_arts = {
            ref: preview.export_previews_from_rasters(
                args.out, ref, colors, n_classes=nc,
                preview_dir=f"{args.out}/{ref}",
            )
            for ref in written
        }
        html = preview.generate_viewer_html(
            args.out, tile_arts, title="GSAP-Spark analysis report",
            metadata={"tiles": len(written), "n_classes": nc, "snapshot": snap},
        )
        print(json.dumps({"job": "report", "snapshot": snap,
                          "tiles": len(written), "viewer": html}))
        spark.stop()
        return
    else:
        snap = build_pyramid(cat, tiles, finest=7, coarsest=4)

    rows = cat.read(spark, {"pip": "pip_pairs", "zonal": "zonal_stats", "knn": "knn",
                            "pyramid": "tile_pyramid"}[args.job]).count()
    print(json.dumps({"job": args.job, "snapshot": snap, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
