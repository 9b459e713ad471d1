"""Driver-facing spatial query catalogue (SURVEY.md §2 J4/J5/A5/R1 + north rule).

Each ``q_*`` function takes (spark, sf_dir) and returns a DataFrame; the
matching ``SQL_*`` string is the DuckDB oracle recomputing the identical
result from the same deterministic integer formulas (datagen.py). Column
names and exact values match — the driver's order-insensitive value hash is
satisfied bit-for-bit.

The golden corpus size is FIXED (GoldenConfig defaults scaled down to keep
the sf0.01 correctness run fast); sf_dir is ignored by these queries (the
relational catalogue uses it). bench.py scales the same operators up
independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import datagen as dg
from .functions.cells import cell_id_sql, cell_res
from .operators import chunking, knn, pip_join, raster, spans, zonal

# fixed correctness-scale corpus (driver runs these at sf0.01)
CFG = dg.GoldenConfig(n_tiles=2000, n_points=500, n_docs=5000, n_media_tiles=200)
LEVEL = 6  # footprint / rollup level
PIP_LEVEL = 5


# ---------------------------------------------------------------------------
# PIP joins (J4)
# ---------------------------------------------------------------------------


def q_pip_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    out = pip_join.pip_join_rect(t, dg.rect_zones_df(spark, CFG), x="cx", y="cy", level=PIP_LEVEL)
    return out.select("media_ref", "zone_id")


SQL_PIP_RECT = f"""WITH {dg.tiles_sql(CFG)}, {dg.rect_zones_sql(CFG)}
SELECT t.media_ref, z.zone_id
FROM tiles_geo t JOIN rzones z
  ON t.cx BETWEEN z.minx AND z.maxx AND t.cy BETWEEN z.miny AND z.maxy"""


def q_pip_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    out = pip_join.pip_join_poly(t, dg.poly_zones_df(spark, CFG), x="cx", y="cy", level=PIP_LEVEL)
    return out.select("media_ref", "zone_id")


_CROSS = "( (ex2-ex1)*(t.cy-ey1) - (t.cx-ex1)*(ey2-ey1) )"
SQL_PIP_POLY = f"""WITH {dg.tiles_sql(CFG)}, {dg.poly_edges_sql(CFG)}
SELECT t.media_ref, e.zone_id
FROM tiles_geo t JOIN pedges e ON TRUE
GROUP BY t.media_ref, e.zone_id
HAVING SUM(CASE WHEN ((ey1 > t.cy) <> (ey2 > t.cy))
                 AND (CASE WHEN ey2 > ey1 THEN {_CROSS} > 0 ELSE {_CROSS} < 0 END)
           THEN 1 ELSE 0 END) % 2 = 1"""


def q_pip_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join lineage surface (J7): tiles falling in NO rect zone."""
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    matched = pip_join.pip_join_rect(
        t, dg.rect_zones_df(spark, CFG), x="cx", y="cy", level=PIP_LEVEL
    ).select("media_ref")
    return t.join(matched, "media_ref", "left_anti").select("media_ref")


SQL_PIP_UNMATCHED = f"""WITH {dg.tiles_sql(CFG)}, {dg.rect_zones_sql(CFG)}
SELECT t.media_ref FROM tiles_geo t
WHERE NOT EXISTS (SELECT 1 FROM rzones z
  WHERE t.cx BETWEEN z.minx AND z.maxx AND t.cy BETWEEN z.miny AND z.maxy)"""


# ---------------------------------------------------------------------------
# kNN (J5)
# ---------------------------------------------------------------------------


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = knn.knn_join(dg.points_df(spark, CFG), dg.tiles_df(spark, CFG), k=CFG.knn_k)
    return out.select("q_id", F.col("rank").cast("long").alias("rank"), "media_ref", "dist_sq")


_D = "(q.qx-t.cx)*(q.qx-t.cx)+(q.qy-t.cy)*(q.qy-t.cy)"
SQL_KNN = f"""WITH {dg.tiles_sql(CFG)}, {dg.points_sql(CFG)},
scored AS (
  SELECT q.q_id, t.media_ref, {_D} AS dist_sq,
         row_number() OVER (PARTITION BY q.q_id ORDER BY {_D}, t.media_ref) AS rank
  FROM qpts q CROSS JOIN tiles_geo t)
SELECT q_id, rank, media_ref, dist_sq FROM scored WHERE rank <= {CFG.knn_k}"""


# ---------------------------------------------------------------------------
# tile assignments / pyramid (north rule: cell encoding + quadtree rollup)
# ---------------------------------------------------------------------------


def q_tile_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raster.tile_footprints(dg.tiles_df(spark, CFG), LEVEL).select(
        "media_ref", "cell", F.col("level").cast("int").alias("level")
    )


def _sql_tile_cells(level: int) -> str:
    res = cell_res(level)
    return f"""WITH {dg.tiles_sql(CFG)},
latt AS (SELECT media_ref,
    CAST(FLOOR(x0 / {res}) AS BIGINT) AS ix0, CAST(FLOOR((x1-1) / {res}) AS BIGINT) AS ix1,
    CAST(FLOOR(y0 / {res}) AS BIGINT) AS iy0, CAST(FLOOR((y1-1) / {res}) AS BIGINT) AS iy1
  FROM tiles_geo)
SELECT l.media_ref,
       {cell_id_sql(f"(l.ix0 + gx.i) * {res}", f"(l.iy0 + gy.i) * {res}", level)} AS cell,
       CAST({level} AS INTEGER) AS level
FROM latt l
JOIN range(0, 64) gx(i) ON gx.i <= l.ix1 - l.ix0
JOIN range(0, 64) gy(i) ON gy.i <= l.iy1 - l.iy0"""


SQL_TILE_CELLS = _sql_tile_cells(LEVEL)


def q_pyramid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadtree pyramid: tile counts per cell at levels LEVEL..LEVEL-3 via
    repeated parent aggregation (each coarser level aggregates the finer one —
    the rollup is hierarchical, not recomputed from scratch)."""
    from .functions.cells import parent_col

    base = raster.tile_footprints(dg.tiles_df(spark, CFG), LEVEL).select("media_ref", "cell")
    levels = [base.groupBy("cell").agg(F.count("*").alias("n_tiles"))]
    cur = base
    for _ in range(3):
        cur = cur.select("media_ref", parent_col(F.col("cell")).alias("cell")).distinct()
        levels.append(cur.groupBy("cell").agg(F.count("*").alias("n_tiles")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.withColumn("level", (F.col("cell") % 32).cast("int"))


def _sql_pyramid() -> str:
    parts = []
    for lv in range(LEVEL, LEVEL - 4, -1):
        res = cell_res(lv)
        parts.append(
            f"""SELECT cell, CAST(count(*) AS BIGINT) AS n_tiles, CAST({lv} AS INTEGER) AS level
FROM (SELECT DISTINCT l.media_ref,
       {cell_id_sql(f"(CAST(FLOOR(l.x0 / {res}) AS BIGINT) + gx.i) * {res}",
                    f"(CAST(FLOOR(l.y0 / {res}) AS BIGINT) + gy.i) * {res}", lv)} AS cell
  FROM tiles_geo l
  JOIN range(0, 64) gx(i) ON gx.i <= CAST(FLOOR((l.x1-1) / {res}) AS BIGINT) - CAST(FLOOR(l.x0 / {res}) AS BIGINT)
  JOIN range(0, 64) gy(i) ON gy.i <= CAST(FLOOR((l.y1-1) / {res}) AS BIGINT) - CAST(FLOOR(l.y0 / {res}) AS BIGINT))
GROUP BY cell"""
        )
    return f"WITH {dg.tiles_sql(CFG)}\n" + "\nUNION ALL\n".join(parts)


SQL_PYRAMID = _sql_pyramid()


# ---------------------------------------------------------------------------
# raster statistics (decode path — Spark decodes real TIFF bytes; the oracle
# recomputes from the DN formula, proving the whole encode/decode chain)
# ---------------------------------------------------------------------------


def q_tile_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raster.tile_pixel_stats(dg.media_df(spark, CFG)).select(
        "media_ref",
        "band",
        "cnt",
        "sum_dn",
        "sum_sq",
        F.col("min_dn").cast("int").alias("min_dn"),
        F.col("max_dn").cast("int").alias("max_dn"),
        "sum_cal",
        "mean_dn",
        "mean_refl",
    )


_DN = dg.dn_sql("t.tile_k", "b.band", "r.i", "c.i")
_PX_CTE = f"""px AS (
  SELECT t.tile_k, t.media_ref, b.band, {_DN} AS dn,
         CASE WHEN t.tile_k % 2 = 1 THEN GREATEST({_DN} - 1000, 0) ELSE {_DN} END AS cal
  FROM tiles_geo t, range(0, {CFG.n_bands}) b(band),
       range(0, {CFG.tile_px}) r(i), range(0, {CFG.tile_px}) c(i)
  WHERE t.tile_k < {CFG.n_media_tiles})"""

SQL_TILE_PIXEL_STATS = f"""WITH {dg.tiles_sql(CFG)}, {_PX_CTE}
SELECT media_ref, CAST(band AS INTEGER) AS band, count(*) AS cnt,
       sum(dn) AS sum_dn, sum(dn*dn) AS sum_sq,
       CAST(min(dn) AS INTEGER) AS min_dn, CAST(max(dn) AS INTEGER) AS max_dn,
       sum(cal) AS sum_cal,
       CAST(sum(dn) AS DOUBLE) / count(*) AS mean_dn,
       CAST(sum(cal) AS DOUBLE) / (10000.0 * count(*)) AS mean_refl
FROM px GROUP BY media_ref, band"""


def q_tile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raster.tile_histogram(dg.media_df(spark, CFG)).select(
        "media_ref", F.col("band").cast("int").alias("band"),
        F.col("bin").cast("int").alias("bin"), "cnt"
    )


SQL_TILE_HISTOGRAM = f"""WITH {dg.tiles_sql(CFG)}, {_PX_CTE}
SELECT media_ref, CAST(band AS INTEGER) AS band,
       CAST((dn * {raster.HIST_BINS}) // 10001 AS INTEGER) AS bin, count(*) AS cnt
FROM px GROUP BY media_ref, band, bin"""


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join_rect(t, dg.rect_zones_df(spark, CFG), x="cx", y="cy", level=PIP_LEVEL)
    stats = raster.tile_pixel_stats(dg.media_df(spark, CFG))
    return zonal.zonal_stats(pairs, stats).select(
        "zone_id", F.col("band").cast("int").alias("band"), "n_tiles", "px_cnt",
        "sum_dn", "sum_sq",
        F.col("min_dn").cast("int").alias("min_dn"),
        F.col("max_dn").cast("int").alias("max_dn"),
        "sum_cal", "mean_dn", "mean_refl",
    )


SQL_ZONAL_STATS = f"""WITH {dg.tiles_sql(CFG)}, {dg.rect_zones_sql(CFG)}, {_PX_CTE},
tstats AS (
  SELECT media_ref, band, count(*) AS cnt, sum(dn) AS sum_dn, sum(dn*dn) AS sum_sq,
         min(dn) AS min_dn, max(dn) AS max_dn, sum(cal) AS sum_cal
  FROM px GROUP BY media_ref, band),
prs AS (
  SELECT t.media_ref, z.zone_id FROM tiles_geo t JOIN rzones z
  ON t.cx BETWEEN z.minx AND z.maxx AND t.cy BETWEEN z.miny AND z.maxy)
SELECT p.zone_id, CAST(s.band AS INTEGER) AS band, count(*) AS n_tiles,
       sum(s.cnt) AS px_cnt, sum(s.sum_dn) AS sum_dn, sum(s.sum_sq) AS sum_sq,
       CAST(min(s.min_dn) AS INTEGER) AS min_dn, CAST(max(s.max_dn) AS INTEGER) AS max_dn,
       sum(s.sum_cal) AS sum_cal,
       CAST(sum(s.sum_dn) AS DOUBLE) / sum(s.cnt) AS mean_dn,
       CAST(sum(s.sum_cal) AS DOUBLE) / (10000.0 * sum(s.cnt)) AS mean_refl
FROM prs p JOIN tstats s USING (media_ref)
GROUP BY p.zone_id, s.band"""


# ---------------------------------------------------------------------------
# interleaved corpus (input_hint invariant + media resolution)
# ---------------------------------------------------------------------------


def q_span_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = dg.documents_df(spark, CFG)
    flat = spans.explode_spans(docs)
    rebuilt = spans.reassemble_spans(flat)  # full explode→shuffle→rebuild cycle
    return rebuilt.select("doc_id", spans.span_fingerprint("spans").alias("fp"))


SQL_SPAN_FINGERPRINTS = f"""WITH {dg.spans_flat_sql(CFG)}
SELECT doc_id, string_agg(
    kind || ':' || coalesce(text, '') || ':' || coalesce(media_ref, '') || ':' ||
    CAST("offset" AS VARCHAR), '|' ORDER BY "offset", j) AS fp
FROM spans_flat GROUP BY doc_id"""


def q_media_span_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship interleaved query: docs → media spans → tile → PIP zone →
    per-zone doc/span counts. Exercises the whole span→media→spatial chain."""
    docs = dg.documents_df(spark, CFG)
    m = spans.media_spans(docs)
    t = dg.tiles_df(spark, CFG).select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join_rect(t, dg.rect_zones_df(spark, CFG), x="cx", y="cy", level=PIP_LEVEL)
    return (
        m.join(pairs.select("media_ref", "zone_id"), "media_ref")
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.countDistinct("media_ref").alias("n_tiles"),
        )
    )


SQL_MEDIA_SPAN_ZONES = f"""WITH {dg.spans_flat_sql(CFG)}, {dg.tiles_sql(CFG)}, {dg.rect_zones_sql(CFG)},
prs AS (
  SELECT t.media_ref, z.zone_id FROM tiles_geo t JOIN rzones z
  ON t.cx BETWEEN z.minx AND z.maxx AND t.cy BETWEEN z.miny AND z.maxy)
SELECT p.zone_id, count(*) AS n_spans,
       count(DISTINCT s.doc_id) AS n_docs, count(DISTINCT s.media_ref) AS n_tiles
FROM spans_flat s JOIN prs p USING (media_ref)
WHERE s.kind = 'media'
GROUP BY p.zone_id"""


def q_chunk_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk/window grid (R1) — pure Catalyst sequence/explode."""
    tiles = dg.tiles_df(spark, CFG).filter(F.col("tile_k") < 100).select("media_ref")
    return chunking.chunk_grid(tiles, height_px=256, width_px=256, zor=64, halo=16).select(
        "media_ref",
        F.col("chunk_r").cast("int").alias("chunk_r"),
        F.col("chunk_c").cast("int").alias("chunk_c"),
        F.col("win_r0").cast("int").alias("win_r0"),
        F.col("win_c0").cast("int").alias("win_c0"),
        F.col("win_h").cast("int").alias("win_h"),
        F.col("win_w").cast("int").alias("win_w"),
    )


SQL_CHUNK_GRID = f"""WITH {dg.tiles_sql(CFG)}
SELECT media_ref,
       CAST(r.i * 64 AS INTEGER) AS chunk_r, CAST(c.i * 64 AS INTEGER) AS chunk_c,
       CAST(r.i * 64 - 16 AS INTEGER) AS win_r0, CAST(c.i * 64 - 16 AS INTEGER) AS win_c0,
       CAST(96 AS INTEGER) AS win_h, CAST(96 AS INTEGER) AS win_w
FROM tiles_geo, range(0, 4) r(i), range(0, 4) c(i)
WHERE tile_k < 100"""


# ---------------------------------------------------------------------------
# non-SQL-expressible (driver records rows-only): full raster pipeline
# ---------------------------------------------------------------------------


def q_global_class_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = dg.GoldenConfig(n_tiles=32, tile_px=64, n_media_tiles=32)
    media = dg.media_df(spark, cfg)
    stats = chunking.chunk_class_stats(media, zor=32, halo=8, patch=16, stride=8)
    return chunking.global_class_probs(stats)


QUERIES = {
    "pip_join_rect": (q_pip_rect, SQL_PIP_RECT),
    "pip_join_poly": (q_pip_poly, SQL_PIP_POLY),
    "pip_unmatched_lineage": (q_pip_unmatched, SQL_PIP_UNMATCHED),
    "knn_ring_expansion": (q_knn, SQL_KNN),
    "tile_footprint_cells": (q_tile_cells, SQL_TILE_CELLS),
    "pyramid_rollup": (q_pyramid_rollup, SQL_PYRAMID),
    "tile_pixel_stats": (q_tile_pixel_stats, SQL_TILE_PIXEL_STATS),
    "tile_histogram": (q_tile_histogram, SQL_TILE_HISTOGRAM),
    "zonal_stats": (q_zonal_stats, SQL_ZONAL_STATS),
    "span_fingerprints": (q_span_fingerprints, SQL_SPAN_FINGERPRINTS),
    "media_span_zones": (q_media_span_zones, SQL_MEDIA_SPAN_ZONES),
    "chunk_grid": (q_chunk_grid, SQL_CHUNK_GRID),
    "global_class_probs": (q_global_class_probs, None),
}
