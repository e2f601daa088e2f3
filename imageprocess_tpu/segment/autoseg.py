"""In-polygon auto-segmentation — the interactive drawer's core loop.

Reference semantics: src/roi_manual_drawer.py:337-418
(``segment_inside_polygon``): bbox slice -> contains_points (matplotlib
rule) -> threshold (percentile of inside values, or BND mode mu + k*sigma
with a p90 fallback when sigma <= 0) -> 4-connected label -> keep largest
component -> fill holes -> find_contours(0.5) -> global coords -> area >=
min_area filter -> approximate_polygon(tolerance) -> largest.

Device part: one jitted program per bbox-tile bucket does the masked
percentile/stats, threshold, CCL and hole filling; marching squares +
Douglas-Peucker run on host (tiny vertex counts).  Returns
``(thr, None, best_polygon)`` exactly like the reference (the mask return
is skipped for speed there too).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.polygon import douglas_peucker
from ..geom.rasterize import rasterize_polygons
from ..morphology.ccl import fill_holes, largest_component
from ..morphology.contours import find_contours, polygon_area_contour
from ..ops.percentile import masked_quantile


@partial(jax.jit, static_argnames=("shape", "mode"))
def _segment_tile(
    sub: jnp.ndarray,           # (Th, Tw) float32, bbox tile
    local_poly: jnp.ndarray,    # (1, V, 2)
    in_crop: jnp.ndarray,       # (Th, Tw) bool validity (crop extent)
    thr_param1000: jnp.ndarray,  # () int32 (percentile in thousandths)
    thr_k: jnp.ndarray,          # () float32 (BND multiplier)
    *,
    shape: Tuple[int, int],
    mode: str,
):
    inside = rasterize_polygons(local_poly, shape)[0] & in_crop
    finite = inside & jnp.isfinite(sub)
    n = finite.sum()

    if mode == "bnd":
        nf = jnp.maximum(n.astype(jnp.float32), 1.0)
        m = jnp.where(finite, sub, 0.0).sum() / nf
        var = jnp.where(finite, (sub - m) ** 2, 0.0).sum() / nf
        s = jnp.sqrt(var)
        thr_bnd = m + thr_k * s
        p90 = masked_quantile(jnp.where(jnp.isfinite(sub), sub, jnp.inf),
                              finite, 90000)
        thr = jnp.where((s <= 0) | ~jnp.isfinite(s), p90, thr_bnd)
    else:
        thr = masked_quantile(jnp.where(jnp.isfinite(sub), sub, jnp.inf),
                              finite, thr_param1000)

    cand = (sub >= thr) & inside
    largest, size = largest_component(cand, connectivity=1)
    mask = fill_holes(largest)
    return thr, mask, n, size


def segment_inside_polygon(
    img: np.ndarray,
    poly: np.ndarray,
    thr_param: float = 90.0,
    min_area: float = 40.0,
    tolerance: float = 1.0,
    mode: str = "percentile",
) -> Tuple[Optional[float], None, Optional[np.ndarray]]:
    """Drawer-core parity; returns (threshold, None, best polygon [x, y])."""
    H, W = img.shape[:2]
    p = np.asarray(poly, float)
    min_x = max(0, int(np.floor(p[:, 0].min())))
    max_x = min(W, int(np.ceil(p[:, 0].max())))
    min_y = max(0, int(np.floor(p[:, 1].min())))
    max_y = min(H, int(np.ceil(p[:, 1].max())))
    if max_x <= min_x or max_y <= min_y:
        return None, None, None
    sh, sw = max_y - min_y, max_x - min_x

    # per-axis pow-2 tiles clamped to THAT axis: a square tile clamped to
    # min(H, W) silently truncated elongated bboxes on non-square frames
    # (the reference slices the true rectangular bbox,
    # roi_manual_drawer.py:358-366); sh <= H and sw <= W by construction,
    # so per-axis clamping always covers the full bbox
    ty = 64
    while ty < sh:
        ty *= 2
    ty = min(ty, H)
    tx = 64
    while tx < sw:
        tx *= 2
    tx = min(tx, W)
    oy = min(min_y, H - ty)
    ox = min(min_x, W - tx)
    sub = np.zeros((ty, tx), np.float32)
    sub[:, :] = img[oy:oy + ty, ox:ox + tx]
    sy, sx = min_y - oy, min_x - ox
    in_crop = np.zeros((ty, tx), bool)
    in_crop[sy:sy + sh, sx:sx + sw] = True

    from ..geom.polygon import pad_polygons

    local = (p - [ox, oy]).astype(np.float32)
    vb = 32
    while vb < len(local):
        vb *= 2
    lpv = pad_polygons([local], vb)[0][None]  # (1, V, 2)

    mode_l = mode.lower()
    thr, mask, n, size = _segment_tile(
        jnp.asarray(sub), jnp.asarray(lpv), jnp.asarray(in_crop),
        jnp.int32(int(round(float(thr_param) * 1000))),
        jnp.float32(thr_param),
        shape=(ty, tx), mode="bnd" if mode_l == "bnd" else "percentile",
    )
    if int(n) == 0:
        return None, None, None
    thr = float(thr)
    if int(size) == 0:
        return thr, None, None
    mask_np = np.asarray(mask)[sy:sy + sh, sx:sx + sw]

    contours = find_contours(mask_np.astype(float), 0.5)
    if not contours:
        return thr, None, None
    polys = []
    for c in contours:
        xy = np.c_[c[:, 1] + min_x, c[:, 0] + min_y]
        area = polygon_area_contour(xy)
        if area >= float(min_area):
            xy_s = douglas_peucker(xy, float(tolerance))
            if len(xy_s) >= 3:
                polys.append((area, xy_s))
    if not polys:
        return thr, None, None
    best = max(polys, key=lambda t: t[0])[1]
    return thr, None, best
