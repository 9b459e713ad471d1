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
from contextlib import contextmanager
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
from geotiff_scalable_analysis_pipeline_spark.plans import memory_model, skew
from geotiff_scalable_analysis_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = float(os.environ.get("BENCH_SCALE", "1.0"))
STEADY = os.environ.get("BENCH_STEADY", "1") == "1"
# timed reps; min reported. Default 2: the host is multi-tenant and a single
# timed pass swings individual queries 3-6× between noise windows (measured:
# raster_stats 2.1 ↔ 8.2 s across back-to-back suite runs) — min-of-2 after
# the warm pass reports the uncontended wall the methodology targets.
REPS = int(os.environ.get("BENCH_REPS", "2"))

N_TILES = int(20_000 * SCALE)
N_DOCS = int(100_000 * SCALE)
N_POINTS = int(5_000 * SCALE)
N_MEDIA = int(1_000 * SCALE)  # payload-bearing tiles (128px × 4 bands ≈ 128 KiB each)
MEDIA_PX = 128

CFG = dg.GoldenConfig(
    n_tiles=N_TILES, n_docs=N_DOCS, n_points=N_POINTS, n_media_tiles=N_MEDIA, tile_px=MEDIA_PX
)
CORPUS = Path(os.environ.get("BENCH_TMP", "/tmp/gsap_bench")) / f"scale_{SCALE}"


# which corpus tables each bench scans — setup only materializes what the
# selected subset needs (media at large scales is GBs; knn/pip don't read it)
BENCH_TABLES = {
    "pip_zonal": {"documents", "tiles", "rect_zones", "poly_zones"},
    "knn": {"points", "tiles"},
    "pyramid_rollup": {"tiles"},
    "raster_stats": {"media"},
    "chunk_pipeline": {"media"},
    "zonal_stats": {"tiles", "rect_zones", "media"},
    "dedup_suite": set(),
    "dedup_text": {"dedup_docs"},
    "overlay": {"overlay_zones_a", "overlay_zones_b"},
    "text_profile": set(),
    "text_profile_scaled": {"dedup_docs"},
    "relational_suite": set(),
    "spatial_analytics": {"points", "tiles"},
    "dbscan": {"points"},
    "corridor": {"points"},
    "graph": set(),
    "triangles": set(),
    "ranktests": {"rank_events"},
    "ranktests_quantized": {"rank_events_q"},
}

# DBSCAN eps. Default shrinks as 1/sqrt(SCALE) so the expected
# ε-neighborhood (λ = π·eps²·n/frame² ≈ 3.5, below continuum percolation)
# is scale-invariant — pair count grows linearly with the corpus, the work
# shape a fixed-radius job has when the FRAME scales with the data.
# BENCH_DBSCAN_EPS overrides (the N→4N sweep uses a FIXED eps instead:
# density then grows with SCALE — denser coverage, same radius — so the
# pair stage and the CC rounds carry enough parallel work per round that
# the measurement is not fixpoint-latency-floor-dominated).
DBSCAN_EPS = int(os.environ.get("BENCH_DBSCAN_EPS", "0")) or max(120, int(1500 / SCALE**0.5))
DBSCAN_MIN_PTS = 4

# docs for the BENCH_SCALE-scaled dedup bench (the sf tables the other text
# queries read do NOT scale with BENCH_SCALE)
N_TEXT_DOCS = int(5_000 * SCALE)

# rows for the BENCH_SCALE-scaled two-sample rank-test bench: a CONTINUOUS
# value domain (~n distinct doubles), the case the round-5 two-phase range
# split exists for — the distinct-value table is corpus-sized, so the old
# single unpartitioned window would funnel the whole corpus through one task
N_RANK_EVENTS = int(1_000_000 * SCALE)

# zones per side for the BENCH_SCALE-scaled overlay bench (the golden 90-zone
# layers are dims; candidate-pair work grows ~quadratically in this count)
N_OVR_ZONES = int(100 * SCALE)

_GENERATORS = {
    "tiles": dg.tiles_df,
    "rect_zones": dg.rect_zones_df,
    "poly_zones": dg.poly_zones_df,
    "points": dg.points_df,
    "documents": dg.documents_df,
    "media": dg.media_df,
}


def setup_corpus(spark, names):
    """Materialize the needed corpus tables to parquet (once per scale)."""
    need = set().union(*(BENCH_TABLES.get(n, set(_GENERATORS)) for n in names))
    CORPUS.mkdir(parents=True, exist_ok=True)
    for table in sorted(need):
        done = CORPUS / f"_READY_{table}"
        if done.exists():
            continue
        if table in ("overlay_zones_a", "overlay_zones_b"):
            gen = dg.rect_zones_df if table.endswith("_a") else dg.rect_zones_b_df
            # 16 files so the zone-explode stage starts wide at every
            # parallelism level (same single-fat-file trap as dedup_docs)
            gen(spark, dg.GoldenConfig(n_rect_zones=N_OVR_ZONES)).repartition(
                16
            ).write.mode("overwrite").parquet(str(CORPUS / table))
        elif table in ("rank_events", "rank_events_q"):
            # deterministic two-group events: xxhash64 pseudo-randomness (no
            # rand() — reproducible at any parallelism). rank_events: ~n
            # distinct double values (continuous domain); rank_events_q: the
            # control with a 100k-value quantized domain — same rows, so a
            # sweep pair isolates the per-distinct-value (Arrow fold) term
            # from the scan/shuffle/sort term
            mod = 1_000_000_000 if table == "rank_events" else 100_000
            df = spark.range(N_RANK_EVENTS).select(
                F.when(F.pmod("id", F.lit(5)) < 2, F.lit("click"))
                .otherwise(F.lit("purchase"))
                .alias("grp"),
                (
                    F.pmod(F.xxhash64("id"), F.lit(mod)).cast("double")
                    / F.lit(1000.0)
                ).alias("val"),
            )
            df.repartition(32).write.mode("overwrite").parquet(str(CORPUS / table))
        elif table == "dedup_docs":
            # written as <dir>/documents.parquet so queries_text callables
            # (which take an sf_dir) can read it directly. 32 output files:
            # a LO-level JVM otherwise writes 2 fat single-row-group files,
            # capping the shingle-scan stage at 2 tasks for EVERY later
            # parallelism level (measured: dedup_text pair_eff stuck at
            # ~0.36 until the corpus was re-laid-out).
            df = dg.text_documents_df(spark, N_TEXT_DOCS)
            df.repartition(32).write.mode("overwrite").parquet(
                str(CORPUS / "dedup" / "documents.parquet")
            )
        else:
            # fixed 32-file layout: a LO-level (2-core) JVM otherwise writes
            # 2 fat files and the scan(+explode) stage of EVERY later
            # parallelism level runs 2 tasks wide — the same single-fat-file
            # trap documented for dedup_docs (measured here: the dbscan
            # ε-join's pairs stage at local[8] flat vs local[2] until the
            # points table was re-laid-out)
            _GENERATORS[table](spark, CFG).repartition(32).write.mode("overwrite").parquet(
                str(CORPUS / table)
            )
        done.write_text("ok")


def _t(spark, name):
    return spark.read.parquet(str(CORPUS / name))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def bench_pip_zonal(spark):
    """North-rule headline: interleaved docs → media spans → PIP join (rect +
    poly) → zonal doc rollup (spans per zone + exact distinct docs per zone).
    Work units = tiles + docs.

    Plan choices that matter (measured on this VM at BENCH_SCALE=40):
    * long surrogate join keys derived in-plan from the string refs — string
      hash/compare through join+agg cost ~1.8×;
    * the span→zone join on ``tk`` is Zipf-skewed (hot tiles carry ~40% of
      media spans). A plain shuffle join puts one hot tile's millions of
      spans × its zones into ONE task — the stage straggles and the extra
      cores at 4N idle (event-log evidence: 43 s hot task vs 2 s median).
      Fix: data-driven salting (plans/skew.py) — the per-tile histogram
      (reused for n_spans) finds hot keys, hot spans spread over
      hash(dk)-salts, the tiny (tile, zone) dim replicates per salt;
    * n_spans needs no doc identity → computed from the per-tile histogram
      joined to zones: map-side combine absorbs the hot tiles, the join left
      side has ONE row per tile (skew-free by construction);
    * n_docs = exact two-phase distinct (dropDuplicates(zone, dk) →
      count per zone) — the dedupe shuffle hashes on the high-cardinality
      (zone, dk), balanced regardless of tile skew.
    """
    m = spans.media_spans(_t(spark, "documents"))
    t = _t(spark, "tiles").select("media_ref", "cx", "cy")
    pairs = pip_join.pip_join(
        t, _t(spark, "rect_zones"), _t(spark, "poly_zones"), x="cx", y="cy"
    )
    # the span scan+explode and the PIP join each feed THREE consumers
    # (histogram, n_spans, n_docs) — persist the narrow projections once
    # instead of recomputing the upstream plans per consumer (the frames are
    # 16-byte rows: ~2.4 MB per 150 k spans, trivially cacheable at any SF)
    mk = m.select(
        F.substring("media_ref", 5, 8).cast("long").alias("tk"),
        F.substring("doc_id", 4, 10).cast("long").alias("dk"),
    ).persist()
    pk = pairs.select(
        F.substring("media_ref", 5, 8).cast("long").alias("tk"), "zone_id"
    ).persist()

    hist = skew.key_histogram(mk, "tk").withColumnRenamed("cnt", "nt").persist()
    plan = skew.materialize_plan(
        skew.salt_plan(hist.withColumnRenamed("nt", "cnt"), "tk", threshold=32.0)
    )
    n_spans = (
        hist.join(pk.hint("shuffle_hash"), "tk")
        .groupBy("zone_id")
        .agg(F.sum("nt").alias("n_spans"))
    )
    n_docs = (
        skew.salted_join(mk, pk, "tk", plan, seed_col="dk")
        .dropDuplicates(["zone_id", "dk"])
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_docs"))
    )
    _force(n_spans.join(n_docs, "zone_id"))
    for f in (hist, mk, pk):
        f.unpersist()
    return N_TILES + N_DOCS


def bench_knn(spark):
    # level from the known target count (skips the count() job the auto path
    # would run — one fewer driver action on the floor-sensitive query).
    # knn_join's default return is a localCheckpoint, NOT a cache-manager
    # entry, so repeated timed reps can never short-circuit against a stale
    # cached plan (the pre-r3 footgun: 296 s cold vs 65 s with stale cache
    # at scale 400) and no manual unpersist is needed.
    out = knn.knn_join(_t(spark, "points"), _t(spark, "tiles"), k=5, level=knn.pick_level(N_TILES))
    _force(out)
    return N_POINTS


def bench_pyramid(spark):
    base = raster.tile_footprints(_t(spark, "tiles"), 8).select("media_ref", "cell")
    _force(raster.pyramid_rollup(base, n_levels=5))
    return N_TILES


# closed-form Arrow/scan sizing for the fat-blob media table (reference ZoR
# autosizer, plans/memory_model.py): payload ≈ px² · bands · 2 B (uint16
# TIFF). Both confs are runtime SQL confs, so the media benches set them per
# query instead of rebuilding the session.
MEDIA_PAYLOAD_BYTES = MEDIA_PX * MEDIA_PX * 4 * 2
_MEDIA_CONF = memory_model.autotune_conf(MEDIA_PAYLOAD_BYTES)
_media_conf_logged = False


@contextmanager
def _media_autotune(spark):
    """Scope the media-payload Arrow/scan confs to ONE bench: snapshot the
    previous values and restore them on exit, so whole-suite runs and
    fresh-JVM single-query runs see identical confs for every non-media
    bench (the run-mode-dependent-timing class of contamination)."""
    global _media_conf_logged
    saved = {k: spark.conf.get(k, None) for k in _MEDIA_CONF}
    for k, v in _MEDIA_CONF.items():
        spark.conf.set(k, v)
    if not _media_conf_logged:
        print(f"# media autotune ({MEDIA_PAYLOAD_BYTES}B payload): {_MEDIA_CONF}", file=sys.stderr)
        _media_conf_logged = True
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def bench_raster_stats(spark):
    with _media_autotune(spark):
        media = _t(spark, "media")
        _force(raster.tile_stats_and_histogram(media))
    return N_MEDIA


def bench_chunk_pipeline(spark):
    with _media_autotune(spark):
        media = _t(spark, "media").limit(max(64, int(256 * SCALE)))
        stats = chunking.chunk_class_stats(media, zor=64, halo=16, patch=32, stride=16)
        _force(chunking.global_class_probs(stats))
    return max(64, int(256 * SCALE))


def bench_zonal_stats(spark):
    # reads the media table too -> same autotuned scan/Arrow confs, applied
    # uniformly so run order can't change any bench's effective confs
    with _media_autotune(spark):
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


def bench_dedup_text(spark):
    """Scaling-evidence surface for the LLM-pipeline dedup flagships:
    minhash-LSH + simhash end-to-end over the BENCH_SCALE-scaled synthetic
    text corpus (the plain dedup_suite reads the fixed-size sf tables, so it
    cannot provide an N→4N datum at a ≥30 s 2-core wall)."""
    from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

    ded_dir = str(CORPUS / "dedup")
    _force(qt.q_minhash_lsh_pairs(spark, ded_dir))
    _force(qt.q_simhash_pairs(spark, ded_dir))
    return N_TEXT_DOCS


def bench_overlay(spark):
    """Scaling-evidence surface for the layer-vs-layer spatial overlay
    (operators/overlay.py): two BENCH_SCALE-scaled rectangle layers through
    the PBSM cell equi-join + reference-point dedup. The full pair output
    (id pair + intersection extents) flows to a noop sink, so what's timed
    is candidate generation + the codegen exact test — not driver collect."""
    from geotiff_scalable_analysis_pipeline_spark.operators import overlay as ov

    out = ov.overlay_rect_join(
        _t(spark, "overlay_zones_a"), _t(spark, "overlay_zones_b")
    )
    _force(out)
    return 2 * N_OVR_ZONES


def bench_relational(spark):
    from geotiff_scalable_analysis_pipeline_spark import queries_relational as qr

    for name in (
        "pricing_summary",
        "region_revenue_5way",
        "events_sessionization",
        # closing-session additions: analytics over the sf fact tables
        "cohort_retention",
        "event_transitions",
        "skyline_parts",
        "basket_pairs",
    ):
        _force(qr.QUERIES[name][0](spark, SF_DIR))
    return 0


def bench_text_profile_scaled(spark):
    """Scaling-evidence surface for the text-profiling family: Gopher
    repetition stats + vocabulary heavy-hitters + tf-idf keywords over the
    BENCH_SCALE-scaled synthetic corpus (same corpus layout as dedup_text —
    the sf-table variant below cannot provide an N→4N datum at a ≥30 s
    2-core wall)."""
    from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

    ded_dir = str(CORPUS / "dedup")
    _force(qt.q_doc_repetition_stats(spark, ded_dir))
    _force(qt.q_vocab_heavy_hitters(spark, ded_dir))
    _force(qt.q_doc_keywords(spark, ded_dir))
    return N_TEXT_DOCS


def bench_text_profile(spark):
    """Text-analytics profiling pass (round-4 additions): Gopher repetition
    stats, vocabulary heavy-hitters, tf-idf keywords, and the composite
    cleaning pipeline over the sf documents table."""
    from geotiff_scalable_analysis_pipeline_spark import queries_text as qt

    for name in (
        "doc_repetition_stats",
        "vocab_heavy_hitters",
        "doc_keywords",
        "corpus_filter_pipeline",
        # closing-session additions: collocations + bounded-state sketch
        "bigram_pmi",
        "cm_sketch_estimates",
    ):
        _force(qt.QUERIES[name][0](spark, SF_DIR))
    return 0


def bench_spatial_analytics(spark):
    """Spatial-analytics family (round-4 additions): exact DBSCAN (the
    suite's one ITERATIVE operator — grid ε-join + O(log n) star-contraction
    rounds), fixed-point IDW surface estimation, and the hypertable LOCF
    gap-fill, all over the scaled corpus tables."""
    from geotiff_scalable_analysis_pipeline_spark.operators import (
        dbscan as db,
        interpolate,
        raster as rop,
        temporal,
    )

    p = _t(spark, "points")
    t = _t(spark, "tiles")
    _force(db.dbscan(p, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS))
    obs = t.select(
        "cx",
        "cy",
        (dg.ihash_col(F.col("tile_k"), 41) % 10000).alias("v"),
        F.col("tile_k").alias("obs_id"),
    )
    _force(interpolate.idw(p, obs, radius=3000, oid="obs_id"))
    cells = rop.tile_footprints(t, 6).select("media_ref", "cell")
    acq = t.select("media_ref", F.col("tile_k").cast("long").alias("ts_h")).join(
        cells, "media_ref"
    )
    _force(
        temporal.gap_fill_locf(
            acq, start=0, stop=N_TILES, step=max(1, N_TILES // 50), keys=("cell",)
        )
    )
    # round-4 additions: KDE heatmap (map-only) + corridor join (bounded
    # equi-join) over the same scaled point layer
    from geotiff_scalable_analysis_pipeline_spark.operators import corridor, density

    _force(density.kde_surface(p, cell=4000, radius=6000))
    from geotiff_scalable_analysis_pipeline_spark.operators import spatial_stats

    mcells = (
        t.select(
            F.expr("cx div 4000").alias("ci"), F.expr("cy div 4000").alias("cj")
        )
        .groupBy("ci", "cj")
        .agg(F.count("*").alias("x"))
    )
    _force(spatial_stats.morans_i_components(mcells))
    _force(spatial_stats.local_moran_components(mcells))
    _force(
        corridor.segment_distance_join(
            p.select("q_id", "qx", "qy"),
            dg.segments_df(spark, int(60 * SCALE)),
            radius=3000,
        )
    )
    return N_POINTS + N_TILES


def bench_graph(spark):
    """Scaling-evidence surface for the graph family: integer PageRank
    (10 iterations), bounded-hop BFS, weighted SSSP, and degree-ordered
    triangle counting over a BENCH_SCALE-scaled random multigraph
    (nodes 300·S, edges 1200·S — constant average degree, so per-round
    join work grows linearly and the iterative rounds dominate)."""
    from geotiff_scalable_analysis_pipeline_spark.operators import (
        graph_bfs,
        kcore,
        pagerank as pr,
        triangles as tri,
    )

    n_nodes = int(300 * SCALE)
    edges = dg.graph_edges_df(spark, n_nodes, int(1200 * SCALE))
    wedges = dg.weighted_graph_edges_df(spark, n_nodes, int(1200 * SCALE))
    sources = spark.range(n_nodes).filter(F.col("id") % 37 == 0).select(
        F.col("id").alias("node")
    )
    # no checkpoint_every here: probed at scale 1600, truncating lineage
    # cost MORE than it saved (39.4/31.5 s vs 36.0/28.2 s at 2/8 cores) —
    # the per-round serial share is stage-scheduling latency, not plan
    # growth, so the sweep instead scales the corpus until per-round
    # compute dominates (see BENCH/BASELINE.md)
    _force(pr.pagerank(spark, edges, n_nodes=n_nodes, iters=10))
    _force(graph_bfs.bfs_hops(edges, sources, max_hops=4))
    _force(graph_bfs.sssp_weighted(wedges, sources, iters=5))
    _force(tri.triangle_counts(edges, max_id=n_nodes - 1))
    _force(kcore.k_core(edges, k=5))
    return n_nodes


def bench_triangles(spark):
    """Scaling-evidence surface for the graph family's SINGLE-SHOT member:
    degree-ordered triangle counting, with node count growing as √S and
    edges as S so the average degree grows √S and the wedge-join work
    grows ~S^1.5 — per-stage compute dominates the fixed job latency at
    moderate scales (the ITERATIVE members cannot reach the ≥30 s
    validity bar without latency domination; see BENCH/BASELINE.md)."""
    from geotiff_scalable_analysis_pipeline_spark.operators import triangles as tri

    n_nodes = max(2, int(300 * SCALE**0.5))
    n_edges = int(1200 * SCALE)
    _force(
        tri.triangle_counts(
            dg.graph_edges_df(spark, n_nodes, n_edges),
            max_id=n_nodes - 1,  # generator ids are hash % n_nodes
            # keep each close slice ≲3 M keys — past that the broadcast hash
            # map outgrows the LLC and random probes stall on DRAM latency
            # (operators/triangles.py close_splits docstring)
            close_splits=max(1, -(-n_edges // 3_000_000)),
        )
    )
    return n_nodes


def bench_corridor(spark):
    """Scaling-evidence surface for the corridor join alone: r-expanded
    segment-bbox grid cover ⋈ point home cell, exact integer point-segment
    predicate (decimal128 interior case). Candidate pairs grow ~quadratically
    in SCALE (both layers scale), so the 2-core wall reaches the ≥30 s
    validity bar at moderate scales."""
    from geotiff_scalable_analysis_pipeline_spark.operators import corridor

    p = _t(spark, "points").select("q_id", "qx", "qy")
    _force(
        corridor.segment_distance_join(
            p, dg.segments_df(spark, int(60 * SCALE)), radius=3000
        )
    )
    return N_POINTS


def bench_dbscan(spark):
    """Scaling-evidence surface for the iterative-operator family: DBSCAN
    alone (ε-self-join → degree → core → star-contraction CC → border
    assignment). The CC fixpoint makes this the only sweep datum whose
    round count is data-dependent — the thing to evidence is that the
    per-round shuffles scale, not just one-shot joins."""
    from geotiff_scalable_analysis_pipeline_spark.operators import dbscan as db

    _force(db.dbscan(_t(spark, "points"), eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS))
    return N_POINTS


def bench_ranktests(spark):
    """Scaling-evidence surface for the round-5 two-phase rank-test rework
    (operators/ranktests.py): Mann-Whitney U + KS D over a continuous value
    domain — distinct-value table ≈ corpus-sized, so the pre-round-5 single
    unpartitioned window would have serialized the whole corpus through one
    task; the range-split form keeps the per-value scan P-way parallel."""
    from geotiff_scalable_analysis_pipeline_spark.operators import ranktests

    _force(
        ranktests.rank_tests_2sample(
            _t(spark, "rank_events"), "grp", "val", "click", "purchase"
        )
    )
    return N_RANK_EVENTS


def bench_ranktests_quantized(spark):
    """Control for the ranktests N→4N row: identical operator and row
    count over a 100k-distinct quantized domain — the per-distinct-value
    Arrow fold shrinks to noise, so this measures the scan + range shuffle
    + sort backbone alone (see BENCH/BASELINE.md round-5 annotation)."""
    from geotiff_scalable_analysis_pipeline_spark.operators import ranktests

    _force(
        ranktests.rank_tests_2sample(
            _t(spark, "rank_events_q"), "grp", "val", "click", "purchase"
        )
    )
    return N_RANK_EVENTS


BENCHES = {
    "pip_zonal": bench_pip_zonal,
    "knn": bench_knn,
    "pyramid_rollup": bench_pyramid,
    "raster_stats": bench_raster_stats,
    "chunk_pipeline": bench_chunk_pipeline,
    "zonal_stats": bench_zonal_stats,
    "dedup_suite": bench_dedup,
    "text_profile": bench_text_profile,
    "spatial_analytics": bench_spatial_analytics,
    "relational_suite": bench_relational,
}

# scaling-evidence-only surface: not part of the default suite (it measures
# the same minhash/simhash code paths dedup_suite already times at sf scale)
EXTRA_BENCHES = {
    "ranktests": bench_ranktests,
    "ranktests_quantized": bench_ranktests_quantized,
    "dedup_text": bench_dedup_text,
    "dbscan": bench_dbscan,
    "corridor": bench_corridor,
    "graph": bench_graph,
    "triangles": bench_triangles,
    "text_profile_scaled": bench_text_profile_scaled,
    "overlay": bench_overlay,
}
BENCHES_ALL = {**BENCHES, **EXTRA_BENCHES}


def main():
    only = os.environ.get("BENCH_ONLY")
    names = only.split(",") if only else list(BENCHES)
    spark = get_spark("gsap-bench")
    spark.range(1000).select(F.sum("id")).collect()
    setup_corpus(spark, names)

    times: dict[str, float] = {}
    units = 0
    total = 0.0
    for name in names:
        fn = BENCHES_ALL[name]
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
