"""Regenerate tests/golden/global_probs.json — the golden-fixture oracle for
the ``global_class_probs`` / ``class_metrics`` driver queries.

The raster probability pipeline (float32 softmax + sin² overlap-add,
reference: src/eo_core/process.py:91-145, wrappers.py:39) is not
SQL-expressible bit-exactly (exp/sin are transcendental; DuckDB computes in
float64). The reference's own test strategy for exactly this surface is
golden fixtures (SURVEY.md §5; north-star: "verified against the reference's
golden tile/zonal-stat fixtures"), so the oracle SQL for these two queries is
a VALUES literal generated HERE from ``tests/oracle.py`` — the *independent*
plain-loop transliteration of the reference formulas, NOT the engine's
vectorized kernels — over the deterministic DN field of datagen.

Quantization mirrors Spark's ``F.round`` (HALF_UP): q = floor(x·SCALE + 0.5)
for the non-negative values produced here. The float64 inputs to that
expression are bit-identical across numpy / JVM because every step after the
float32 pipeline output is IEEE-754 float64 arithmetic in a pinned order
(sorted chunk fold, array-ordered entropy fold); the only transcendental in
float64 is log() in the entropy, where glibc and the JVM agree on these 128
fixture inputs (pinned by tests/test_chunking.py::test_golden_probs_fixture
and re-checked by the driver gate every round).

Run:  python scripts/gen_golden_probs.py   (writes the JSON; idempotent)
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from geotiff_scalable_analysis_pipeline_spark import datagen as dg  # noqa: E402
from oracle import oracle_chunk_class_stats  # noqa: E402

# must match queries_spatial.q_global_class_probs
N_TILES, TILE_PX = 32, 64
ZOR, HALO, PATCH, STRIDE = 32, 8, 16, 8
QSCALE = 10**9  # mean/min/max/metrics quantization (values in [0, ~1.4])


def q(x: float) -> int:
    """Spark F.round semantics for non-negative x: Spark rounds
    BigDecimal.valueOf(double) — the double's shortest decimal repr — with
    HALF_UP, which `decimal.Decimal(repr(x))` + ROUND_HALF_UP mirrors
    exactly. (A bare floor(x*SCALE + 0.5) can disagree when the float64
    +0.5 addition rounds across the half boundary; the drift test in
    tests/test_golden.py is the gate either way — it pins today's values
    against the engine.)"""
    import decimal

    d = decimal.Decimal(repr(float(x))) * QSCALE
    return int(d.quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP))


def main() -> dict:
    cfg = dg.GoldenConfig(n_tiles=N_TILES, tile_px=TILE_PX, n_media_tiles=N_TILES)
    band, r, c = np.meshgrid(
        np.arange(cfg.n_bands), np.arange(TILE_PX), np.arange(TILE_PX), indexing="ij"
    )
    probs_rows = []
    metrics_rows = []
    for tile_k in range(N_TILES):
        ref = f"tile{tile_k:08d}"
        baseline = 300 if tile_k % 2 == 0 else 500
        dn = dg.dn_np(np.int64(tile_k), band, r, c)
        rows = oracle_chunk_class_stats(dn, baseline, ZOR, HALO, PATCH, STRIDE)
        # global_class_probs: order-pinned float64 fold per class — sort
        # partials by (chunk_r, chunk_c), accumulate in that order
        by_class: dict[int, list] = {}
        for chunk_r, chunk_c, cls, zor_sum, zor_cnt, zor_min, zor_max in rows:
            by_class.setdefault(cls, []).append(
                (chunk_r, chunk_c, zor_sum, zor_cnt, zor_min, zor_max)
            )
        means = []
        for cls in sorted(by_class):
            parts = sorted(by_class[cls])  # (chunk_r, chunk_c) ascending
            acc = 0.0
            for _, _, s, *_ in parts:
                acc = acc + s
            px_cnt = sum(p[3] for p in parts)
            mean = acc / px_cnt
            means.append(mean)
            probs_rows.append(
                {
                    "media_ref": ref,
                    "class": cls,
                    "q_mean_prob": q(mean),
                    "q_prob_min": q(min(p[4] for p in parts)),
                    "q_prob_max": q(max(p[5] for p in parts)),
                    "px_cnt": px_cnt,
                }
            )
        # class_metrics over the per-tile mean vector (array order = class asc)
        mx = max(means)
        argmax = means.index(mx)
        ent = 0.0
        for p in means:
            ent = ent - p * math.log(min(max(p, 1e-6), 1.0))
        desc = sorted(means, reverse=True)
        gap = desc[0] - desc[1]
        metrics_rows.append(
            {
                "media_ref": ref,
                "argmax_class": argmax,
                "q_max_prob": q(mx),
                "q_entropy": q(ent),
                "q_pred_gap": q(gap),
                "q_binary_gradient": q(means[1]) if len(means) == 2 else None,
            }
        )
    fixture = {
        "config": {
            "n_tiles": N_TILES,
            "tile_px": TILE_PX,
            "zor": ZOR,
            "halo": HALO,
            "patch": PATCH,
            "stride": STRIDE,
            "qscale": QSCALE,
        },
        "global_class_probs": probs_rows,
        "class_metrics": metrics_rows,
    }
    return fixture


if __name__ == "__main__":
    out = REPO / "tests" / "golden" / "global_probs.json"
    fixture = main()
    out.write_text(json.dumps(fixture, indent=1) + "\n")
    print(f"wrote {out}: {len(fixture['global_class_probs'])} prob rows, "
          f"{len(fixture['class_metrics'])} metric rows")
