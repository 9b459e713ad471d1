"""K4 preview PNGs + K6 HTML viewer — real artifacts via the engine's codec.

Previously declared cosmetic non-goals because the sandbox has no image
libraries; with ``formats/png.py`` (round 4) both are now cheap and real:

* K4 (reference: src/eo_core/reporters/preview.py:21-139): per-tile preview
  PNGs — class map via order-0 downscale + label color LUT
  (utils.py:65-115), continuous metrics (max-prob / entropy / gap) via
  order-1 downscale + normalize + colormap (utils.py:117-155), each with a
  colorbar strip.
* K6 (reference: src/eo_core/generate_viewer.py:6-525): a single
  self-contained HTML page embedding the previews as base64 data URIs with
  a per-tile metadata table.

Fidelity note: the reference colors continuous data with matplotlib's
viridis/magma/plasma; matplotlib is not available here, so the ramps below
are 5-anchor linear approximations of those palettes (endpoints + midpoints
are public knowledge). Class-map previews use the caller's exact LUT, so
they are pixel-faithful; continuous previews are visually equivalent, not
byte-identical to matplotlib output. Everything is deterministic.
"""

from __future__ import annotations

import base64
import html as _html
import json
from pathlib import Path

import numpy as np

# 5-anchor approximations of the reference's continuous palettes
RAMPS: dict[str, list[tuple[int, int, int]]] = {
    "viridis": [(68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98), (253, 231, 37)],
    "magma": [(0, 0, 4), (81, 18, 124), (183, 55, 121), (254, 159, 109), (252, 253, 191)],
    "plasma": [(13, 8, 135), (126, 3, 168), (204, 71, 120), (248, 149, 64), (240, 249, 33)],
}


def colormap_lut(name: str) -> np.ndarray:
    """(256, 3) uint8 LUT: piecewise-linear interpolation of the ramp anchors."""
    anchors = np.array(RAMPS[name], dtype=np.float64)
    pos = np.linspace(0.0, 255.0, len(anchors))
    x = np.arange(256, dtype=np.float64)
    out = np.stack([np.interp(x, pos, anchors[:, c]) for c in range(3)], axis=1)
    return np.rint(out).astype(np.uint8)


def render_class_preview(
    class_arr: np.ndarray, colors: np.ndarray, downscale: int = 10
) -> np.ndarray:
    """Class-index raster → downscaled RGB. Order-0 (nearest) downscale — the
    reference's ``zoom(mask, 1/f, order=0)`` — then exact LUT gather; indices
    past the LUT fall back to gray (reference utils.py:101)."""
    from ..operators.multimodal import _resize_nearest

    h = max(1, class_arr.shape[0] // downscale)
    w = max(1, class_arr.shape[1] // downscale)
    small = _resize_nearest(class_arr[:, :, None], h, w)[:, :, 0] if downscale > 1 else class_arr
    lut = np.vstack([colors.astype(np.uint8), np.array([[128, 128, 128]], dtype=np.uint8)])
    idx = small.astype(np.int64)
    idx = np.where((idx < 0) | (idx >= len(colors)), len(colors), idx)  # gray fallback
    return lut[idx]


def render_float_preview(
    arr: np.ndarray,
    cmap: str = "viridis",
    downscale: int = 10,
    vmin: float | None = None,
    vmax: float | None = None,
) -> np.ndarray:
    """Continuous raster → downscaled (order-1 bilinear, reference
    utils.py:135) → normalize [vmin, vmax] → colormap RGB."""
    from ..operators.multimodal import resize_bilinear

    h = max(1, arr.shape[0] // downscale)
    w = max(1, arr.shape[1] // downscale)
    small = resize_bilinear(arr.astype(np.float64), h, w) if downscale > 1 else arr.astype(np.float64)
    lo = float(np.min(small)) if vmin is None else vmin
    hi = float(np.max(small)) if vmax is None else vmax
    norm = np.zeros_like(small) if hi == lo else np.clip((small - lo) / (hi - lo), 0.0, 1.0)
    lut = colormap_lut(cmap)
    return lut[np.rint(norm * 255).astype(np.int64)]


def render_colorbar(cmap: str, width: int = 256, height: int = 16) -> np.ndarray:
    lut = colormap_lut(cmap)
    strip = lut[(np.arange(width) * 256 // width)]
    return np.broadcast_to(strip[None, :, :], (height, width, 3)).copy()


# metric → reference colormap + fixed range (preview.py:78-130)
METRIC_CMAPS = {
    "maxprob": ("viridis", 0.0, 1.0),
    "entropy": ("magma", 0.0, None),  # vmax = ln(n_classes), caller-supplied
    "gap": ("plasma", 0.0, 1.0),
}


def export_tile_previews(
    out_dir: str | Path,
    tile_name: str,
    class_arr: np.ndarray | None,
    colors: np.ndarray | None,
    metrics: dict[str, np.ndarray] | None = None,
    n_classes: int = 2,
    downscale: int = 10,
) -> dict[str, str]:
    """K4: write preview_class.png + preview_<metric>.png (+ colorbars) for
    one tile. Small-output driver-side sink, same contract as the other
    export_* helpers. Returns {artifact: path}."""
    from ..formats import png

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written: dict[str, str] = {}
    if class_arr is not None:
        p = out / "preview_class.png"
        p.write_bytes(png.encode(render_class_preview(class_arr, colors, downscale)))
        written["class"] = str(p)
    for name, arr in (metrics or {}).items():
        cmap, vmin, vmax = METRIC_CMAPS[name]
        if name == "entropy" and vmax is None:
            vmax = float(np.log(max(n_classes, 2)))
        p = out / f"preview_{name}.png"
        p.write_bytes(png.encode(render_float_preview(arr, cmap, downscale, vmin, vmax)))
        written[name] = str(p)
        cb = out / f"preview_{name}_colorbar.png"
        cb.write_bytes(png.encode(render_colorbar(cmap)))
        written[f"{name}_colorbar"] = str(cb)
    return written


def generate_viewer_html(
    out_dir: str | Path,
    tiles: dict[str, dict[str, str]],
    title: str = "Classification preview",
    metadata: dict | None = None,
) -> str:
    """K6: one self-contained HTML page embedding every preview PNG as a
    base64 data URI plus a metadata table — openable with no server, like
    the reference's generated viewer. ``tiles``: tile_name → {artifact:
    png_path} (the export_tile_previews return value)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    esc = lambda s: _html.escape(str(s), quote=True)
    rows = []
    for tile_name in sorted(tiles):
        cells = []
        for artifact in sorted(tiles[tile_name]):
            b64 = base64.b64encode(Path(tiles[tile_name][artifact]).read_bytes()).decode()
            cells.append(
                f'<figure><img alt="{esc(tile_name)} {esc(artifact)}" '
                f'src="data:image/png;base64,{b64}"/>'
                f"<figcaption>{esc(artifact)}</figcaption></figure>"
            )
        rows.append(f"<section><h2>{esc(tile_name)}</h2>{''.join(cells)}</section>")
    meta_html = ""
    if metadata:
        items = "".join(
            f"<tr><td>{esc(k)}</td><td>{esc(json.dumps(v))}</td></tr>"
            for k, v in sorted(metadata.items())
        )
        meta_html = f"<table><caption>metadata</caption>{items}</table>"
    html = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{esc(title)}</title>"
        "<style>body{font-family:sans-serif;margin:2rem}"
        "figure{display:inline-block;margin:0 1rem 1rem 0}"
        "img{image-rendering:pixelated;border:1px solid #ccc}"
        "td{border:1px solid #ccc;padding:2px 8px}</style>"
        f"</head><body><h1>{esc(title)}</h1>{meta_html}{''.join(rows)}</body></html>"
    )
    p = out / "index.html"
    p.write_text(html)
    return str(p)
