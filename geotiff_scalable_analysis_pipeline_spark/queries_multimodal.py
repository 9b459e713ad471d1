"""Multimodal driver queries — REAL-codec decode vs formula-recomputing oracles.

The corpus (datagen.multimodal_df) carries genuine PNG / WAV / PNG-frame
payloads whose pixel/sample values come from integer formulas
(datagen.mm_pix_np / mm_sample_np). The Spark side decodes the wire bytes
(formats/png.py zlib inflate + unfilter, formats/wav.py RIFF walk); the
DuckDB oracle recomputes identical statistics straight from the formulas
(datagen.mm_pix_sql / mm_sample_sql) — it never sees the payloads, so the
pairing independently verifies the whole encode→decode path, not just the
aggregation.

Reference parity: the reference pipeline decodes every raster payload before
analysis (src/eo_core/data.py:375-410 windowed reads); these queries give
the non-GeoTIFF modalities the same first-class treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import datagen as dg
from .operators import multimodal as mm

N_MM = 60  # driver-correctness corpus size (20 per modality)

_REF = "'mm' || lpad(CAST(k AS VARCHAR), 6, '0')"


def _corpus(spark: SparkSession) -> DataFrame:
    return dg.multimodal_df(spark, N_MM)


def q_multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.image_pixel_stats(_corpus(spark))


SQL_MM_PIXEL_STATS = f"""
WITH px AS (
  SELECT k, ch.ch, {dg.mm_pix_sql("k", "r.r", "c.c", "ch.ch")} AS px
  FROM range(0, {N_MM}) ks(k),
       range(0, {dg.MM_H}) r(r), range(0, {dg.MM_W}) c(c),
       range(0, {dg.MM_C}) ch(ch)
  WHERE k % 3 = 0)
SELECT {_REF} AS media_ref, CAST(ch AS INTEGER) AS ch,
       count(*) AS cnt, CAST(sum(px) AS BIGINT) AS sum_px,
       CAST(min(px) AS INTEGER) AS min_px, CAST(max(px) AS INTEGER) AS max_px
FROM px GROUP BY k, ch"""


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.audio_sample_stats(_corpus(spark))


SQL_MM_AUDIO_STATS = f"""
WITH s AS (
  SELECT k, {dg.mm_sample_sql("k", "n.n")} AS pcm
  FROM range(0, {N_MM}) ks(k), range(0, {dg.MM_RATE}) n(n)
  WHERE k % 3 = 1)
SELECT {_REF} AS media_ref, count(*) AS n_samples, CAST(sum(pcm) AS BIGINT) AS sum_pcm,
       CAST(min(pcm) AS INTEGER) AS min_pcm, CAST(max(pcm) AS INTEGER) AS max_pcm
FROM s GROUP BY k"""


def q_multimodal_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.video_frame_stats(_corpus(spark))


SQL_MM_VIDEO_STATS = f"""
WITH px AS (
  SELECT k, f.f, {dg.mm_pix_sql("k * 64 + f.f", "r.r", "c.c", "ch.ch")} AS px
  FROM range(0, {N_MM}) ks(k), range(0, {dg.MM_FRAMES}) f(f),
       range(0, {dg.MM_H}) r(r), range(0, {dg.MM_W}) c(c),
       range(0, {dg.MM_C}) ch(ch)
  WHERE k % 3 = 2)
SELECT {_REF} AS media_ref, CAST(f AS INTEGER) AS frame, CAST(sum(px) AS BIGINT) AS sum_px
FROM px GROUP BY k, f"""


QUERIES = {
    "multimodal_pixel_stats": (q_multimodal_pixel_stats, SQL_MM_PIXEL_STATS),
    "multimodal_audio_stats": (q_multimodal_audio_stats, SQL_MM_AUDIO_STATS),
    "multimodal_video_stats": (q_multimodal_video_stats, SQL_MM_VIDEO_STATS),
}
