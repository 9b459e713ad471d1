"""Committed golden fixtures (FIXTURES.md §5): the engine must reproduce the
repo-committed oracle outputs bit-for-bit — protects against coordinated
drift of engine AND oracle."""

import json
from pathlib import Path

from geotiff_scalable_analysis_pipeline_spark import datagen as dg
from geotiff_scalable_analysis_pipeline_spark.operators import chunking

GOLDEN = Path(__file__).parent / "golden"


def test_chunk_class_stats_matches_committed_golden(spark):
    want = json.loads((GOLDEN / "chunk_class_stats.json").read_text())
    cfg = dg.GoldenConfig(n_tiles=3, tile_px=48, n_media_tiles=3)
    media = dg.media_df(spark, cfg)
    got = (
        chunking.chunk_class_stats(media, zor=16, halo=8, patch=16, stride=8)
        .orderBy("media_ref", "chunk_r", "chunk_c", "class")
        .collect()
    )
    want.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
    assert len(got) == len(want) == 108
    for g, w in zip(got, want):
        ref, cr, cc, cls, zsum, zcnt, zmin, zmax = w
        assert (g.media_ref, g.chunk_r, g.chunk_c, g["class"], g.zor_cnt) == (
            ref, cr, cc, cls, zcnt,
        )
        assert g.zor_sum == zsum  # float64 bitwise via JSON round-trip
        assert g.zor_min == zmin and g.zor_max == zmax
