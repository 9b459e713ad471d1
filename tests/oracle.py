"""Independent numpy transliteration of the reference pipeline's formulas.

Deliberately written as plain, explicit loops (not shared with the engine's
vectorized kernels) so it acts as a true oracle for:

* patch tail rule          (reference: src/eo_core/data.py:486-519)
* sinusoidal window        (reference: src/eo_core/process.py:91-93)
* weighted overlap-add     (reference: src/eo_core/process.py:124-145)
* ZoR crop + bounds clamp  (reference: src/eo_core/process.py:147-168)
* radiometric calibration  (reference: src/eo_core/data.py:350-357, 413-417)
"""

from __future__ import annotations

import numpy as np


def oracle_patch_coords(H, W, P, S):
    coords = []
    r = 0
    while r <= H - P:
        c = 0
        while c <= W - P:
            coords.append((r, c))
            c += S
        r += S
    if (H - P) % S != 0:
        c = 0
        while c <= W - P:
            coords.append((H - P, c))
            c += S
    if (W - P) % S != 0:
        r = 0
        while r <= H - P:
            coords.append((r, W - P))
            r += S
    if (H - P) % S != 0 and (W - P) % S != 0:
        coords.append((H - P, W - P))
    if not coords:
        if H >= P and W >= P:
            coords.append((0, 0))
        else:
            raise ValueError("too small")
    return coords


def oracle_window(P):
    w1 = np.sin(np.linspace(0, np.pi, P)) ** 2
    out = np.empty((P, P), dtype=np.float32)
    for i in range(P):
        for j in range(P):
            out[i, j] = np.float32(w1[i] * w1[j])
    return out


def oracle_overlap_add(scores, coords, H, W, P):
    """scores: (N, C) — classification shape. Explicit per-patch loop."""
    C = scores.shape[1]
    w = oracle_window(P)
    avg = np.zeros((C, H, W), dtype=np.float32)
    wsum = np.zeros((1, H, W), dtype=np.float32)
    for idx, (r, c) in enumerate(coords):
        pdata = scores[idx][:, None, None]
        avg[:, r : r + P, c : c + P] += pdata * w[None, :, :]
        wsum[:, r : r + P, c : c + P] += w[None, :, :]
    wsum[wsum == 0] = 1.0
    return avg / wsum


def oracle_calibrate(dn: np.ndarray, baseline: int) -> np.ndarray:
    a = dn.astype(np.float32)
    if baseline >= 400:
        a = np.maximum(a - 1000.0, 0.0)
    return a / 10000.0


def oracle_reflect_pad(a, top, bottom, left, right):
    return np.pad(a, ((0, 0), (top, bottom), (left, right)), mode="reflect")


def oracle_class_scores(patches):
    means = patches.astype(np.float32).mean(axis=(2, 3))
    out = np.empty_like(means)
    for i in range(means.shape[0]):
        m = means[i] - means[i].max()
        e = np.exp(m)
        out[i] = e / e.sum()
    return out.astype(np.float32)


def oracle_chunk_class_stats(dn_cube, baseline, zor, halo, patch, stride):
    """Full per-tile pipeline → rows (chunk_r, chunk_c, class, zor_sum, zor_cnt,
    zor_min, zor_max) in emission order."""
    C, H_full, W_full = dn_cube.shape
    side = zor + 2 * halo
    rows = []
    for r0 in range(0, H_full, zor):
        for c0 in range(0, W_full, zor):
            wr, wc = r0 - halo, c0 - halo
            ir0, ic0 = max(wr, 0), max(wc, 0)
            ir1, ic1 = min(wr + side, H_full), min(wc + side, W_full)
            a = oracle_calibrate(dn_cube[:, ir0:ir1, ic0:ic1], baseline)
            a = oracle_reflect_pad(a, ir0 - wr, wr + side - ir1, ic0 - wc, wc + side - ic1)
            coords = oracle_patch_coords(side, side, patch, stride)
            patches = np.stack([a[:, r : r + patch, c : c + patch] for r, c in coords])
            scores = oracle_class_scores(patches)
            probs = oracle_overlap_add(scores, coords, side, side, patch)
            zorp = probs[:, halo : side - halo, halo : side - halo]
            h_ok = min(zor, H_full - r0)
            w_ok = min(zor, W_full - c0)
            if h_ok <= 0 or w_ok <= 0:
                continue
            zorp = zorp[:, :h_ok, :w_ok]
            for cls in range(zorp.shape[0]):
                rows.append(
                    (
                        r0,
                        c0,
                        cls,
                        float(zorp[cls].sum(dtype=np.float64)),
                        h_ok * w_ok,
                        float(np.float64(zorp[cls].min())),
                        float(np.float64(zorp[cls].max())),
                    )
                )
    return rows


def oracle_chunk_prob_cube(dn_cube, baseline, zor, halo, patch, stride):
    """Full-resolution (C, H, W) float32 probability cube — the K2 payload
    oracle: same per-chunk pipeline, chunks placed at their disjoint ZoR
    windows (reference reporters/probability.py:17-66 windowed writes)."""
    C, H_full, W_full = dn_cube.shape
    side = zor + 2 * halo
    cube = None
    for r0 in range(0, H_full, zor):
        for c0 in range(0, W_full, zor):
            wr, wc = r0 - halo, c0 - halo
            ir0, ic0 = max(wr, 0), max(wc, 0)
            ir1, ic1 = min(wr + side, H_full), min(wc + side, W_full)
            a = oracle_calibrate(dn_cube[:, ir0:ir1, ic0:ic1], baseline)
            a = oracle_reflect_pad(a, ir0 - wr, wr + side - ir1, ic0 - wc, wc + side - ic1)
            coords = oracle_patch_coords(side, side, patch, stride)
            patches = np.stack([a[:, r : r + patch, c : c + patch] for r, c in coords])
            scores = oracle_class_scores(patches)
            probs = oracle_overlap_add(scores, coords, side, side, patch)
            zorp = probs[:, halo : side - halo, halo : side - halo]
            h_ok = min(zor, H_full - r0)
            w_ok = min(zor, W_full - c0)
            if h_ok <= 0 or w_ok <= 0:
                continue
            if cube is None:
                cube = np.zeros((zorp.shape[0], H_full, W_full), dtype=np.float32)
            cube[:, r0 : r0 + h_ok, c0 : c0 + w_ok] = zorp[:, :h_ok, :w_ok]
    return cube
