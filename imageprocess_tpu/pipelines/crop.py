"""Per-ROI channel cropping & export pipeline (the reference's
roi_channel_cropper).

Reference semantics: src/roi_channel_cropper.py — ``run_crop`` (:778-989):
bbox + max(10, 5%) pad, percentile-cut normalization (low_cut / 100-high_cut
with min/max fallback), gamma ``x^(1/g)``, optional single-color tint,
ROI-outside masking; outputs PNG (fixed out size), normalized TIFF16 and
raw-value TIFF crops named ``{S}[_t]{_roi}{_ch}``.

Device design: per-ROI crops run as bbox tiles (one jit per pow-2 bucket)
computing rasterization, the two masked percentiles and the normalize/gamma
view in a single fused program; the host writes files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import naming, roiio, tiffio
from ..core.i18n import t
from ..core.naming import ChannelGrammar
from ..geom.rasterize import rasterize_polygons
from ..ops.percentile import masked_quantile, p1000_of
from .intensity import _bucket

COLOR_MAP = {
    "Grayscale": None,
    "Cyan": (0.0, 1.0, 1.0),
    "Blue": (0.0, 0.0, 1.0),
    "Red": (1.0, 0.0, 0.0),
    "Yellow": (1.0, 1.0, 0.0),
    "Green": (0.0, 1.0, 0.0),
    "Magenta": (1.0, 0.0, 1.0),
}


@dataclass
class CropConfig:
    channel: int = 1
    timelapse: bool = False
    color: str = "Grayscale"
    gamma: float = 1.0
    low_cut: float = 0.5        # lo = percentile(vals, low_cut)
    high_cut: float = 0.5       # hi = percentile(vals, 100 - high_cut)
    mask_outside: bool = False
    save_png: bool = True
    save_tiff16: bool = False
    save_tiff_raw: bool = False
    fixed_crop: bool = True
    crop_w: int = 500
    crop_h: int = 500
    add_scalebar: bool = False
    px_um: Optional[float] = None
    sb_len_um: Optional[float] = None
    png_dpi: int = 300
    subset_stage: Optional[int] = None
    subset_time: Optional[int] = None
    subset_roi: Optional[int] = None
    grammar: ChannelGrammar = ChannelGrammar.TOKEN_OR_LAST


@partial(jax.jit, static_argnames=("tile", "mask_outside"))
def crop_view_tiled(
    img: jnp.ndarray,           # (H, W) float32
    local_polys: jnp.ndarray,   # (N, V, 2) coords relative to tile origin
    offsets: jnp.ndarray,       # (N, 2) effective (clamped) tile origins
    crop_start: jnp.ndarray,    # (N, 2) crop origin within tile
    crop_size: jnp.ndarray,     # (N, 2) crop [h, w]
    lo_p1000: jnp.ndarray,      # () int32
    hi_p1000: jnp.ndarray,      # () int32
    gamma: jnp.ndarray,         # () float32
    *,
    tile: int,
    mask_outside: bool,
):
    """(norm_gamma (N, T, T), local_mask (N, T, T), ok (N,)) — the cropper's
    normalize-cut-gamma view computed per ROI tile."""
    masks = rasterize_polygons(local_polys, (tile, tile))
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)

    def per_roi(mask_i, off, cstart, csize):
        t = jax.lax.dynamic_slice(img, (off[0], off[1]), (tile, tile)).astype(
            jnp.float32)
        in_crop = ((rows >= cstart[0]) & (rows < cstart[0] + csize[0])
                   & (cols >= cstart[1]) & (cols < cstart[1] + csize[1]))
        finite = in_crop & jnp.isfinite(t)
        n = finite.sum()
        tv = jnp.where(jnp.isfinite(t), t, jnp.inf)
        lo = masked_quantile(tv, finite, lo_p1000)
        hi = masked_quantile(tv, finite, hi_p1000)
        vmin = jnp.where(finite, t, jnp.inf).min()
        vmax = jnp.where(finite, t, -jnp.inf).max()
        bad = ~jnp.isfinite(lo) | ~jnp.isfinite(hi) | (hi <= lo)
        lo = jnp.where(bad, vmin, lo)
        hi = jnp.where(bad, vmax, hi)
        ok = (n > 0) & jnp.isfinite(lo) & jnp.isfinite(hi) & (hi > lo)
        norm = jnp.clip((t - lo) / jnp.where(hi > lo, hi - lo, 1.0), 0.0, 1.0)
        if mask_outside:
            norm = norm * mask_i.astype(jnp.float32)
        return jnp.power(norm, 1.0 / gamma), mask_i, ok

    return jax.vmap(per_roi)(masks, offsets, crop_start, crop_size)


def run_crop(
    raw_dir: str,
    roi_dir: str,
    out_root: str,
    cfg: CropConfig,
    log=print,
) -> List[str]:
    """run_crop parity (roi_channel_cropper.py:778-989); returns written
    file paths."""
    from ..report.render import save_png_image

    files = naming.list_tifs(raw_dir)
    fmap = {}
    for p in files:
        k = naming.parse_tokens(os.path.basename(p), cfg.timelapse, cfg.grammar)
        if k.stage is None or k.channel != cfg.channel:
            continue
        s = naming.fmt_stage(k.stage)
        t_code = naming.fmt_time(k.time) if (cfg.timelapse and k.time is not None) else None
        fmap[(s, t_code)] = p
    if not fmap:
        log(t("crop_no_channel").format(ch=cfg.channel))
        return []

    if cfg.subset_stage is not None:
        s_code = naming.fmt_stage(cfg.subset_stage)
        if not cfg.timelapse or cfg.subset_time is None:
            fmap = {k: v for k, v in fmap.items() if k[0] == s_code}
        else:
            t_code = naming.fmt_time(cfg.subset_time)
            fmap = {k: v for k, v in fmap.items() if k == (s_code, t_code)}
        if not fmap:
            log(t("crop_subset_no_match"))
            return []

    png_dir = os.path.join(out_root, "PNG")
    tif16_dir = os.path.join(out_root, "TIFF16")
    tif_dir = os.path.join(out_root, "TIFF")
    for d, on in ((png_dir, cfg.save_png), (tif16_dir, cfg.save_tiff16),
                  (tif_dir, cfg.save_tiff_raw)):
        if on:
            os.makedirs(d, exist_ok=True)

    out_px = ((cfg.crop_w, cfg.crop_h)
              if cfg.fixed_crop and cfg.crop_w and cfg.crop_h else None)
    color_rgb = COLOR_MAP.get(cfg.color)
    lo_p = jnp.int32(p1000_of(cfg.low_cut))
    hi_p = jnp.int32(p1000_of(100.0 - cfg.high_cut))
    written: List[str] = []

    from ..parallel.runner import PrefetchLoader

    def _load(item):
        (s, t_code), ipath = item
        raw = tiffio.squeeze_first_channel(tiffio.read_tiff(ipath))
        keytag = f"{s}{('_' + t_code) if (cfg.timelapse and t_code) else ''}"
        base = os.path.join(roi_dir, keytag)
        polys = (roiio.load_roi_polygons(base + ".json")
                 if os.path.exists(base + ".json") else None)
        return (s, t_code), keytag, raw, polys

    from ..parallel.runner import LoadError

    for item in PrefetchLoader(_load, sorted(fmap.items()), workers=8):
        if isinstance(item, LoadError):
            log(t("err_worker").format(key=item.item[0], error=item.error))
            continue
        (s, t_code), keytag, raw_full, polys = item
        H, W = raw_full.shape
        if not polys:
            log(t("crop_no_roi").format(tag=keytag))
            continue

        roi_indices = list(range(1, len(polys) + 1))
        if cfg.subset_roi is not None:
            k = int(cfg.subset_roi)
            if 1 <= k <= len(polys):
                roi_indices = [k]
            else:
                log(t("crop_subset_warn").format(tag=keytag, k=k))
                continue
        sel_polys = [np.asarray(polys[i - 1], float) for i in roi_indices]

        # reference crop boxes: bbox +- max(10, 5% of max dim), clamped
        pad = max(10, int(0.05 * max(W, H)))
        boxes = []
        for P in sel_polys:
            x0 = max(int(P[:, 0].min()) - pad, 0)
            x1 = min(int(P[:, 0].max()) + pad, W - 1)
            y0 = max(int(P[:, 1].min()) - pad, 0)
            y1 = min(int(P[:, 1].max()) + pad, H - 1)
            boxes.append((y0, x0, y1 - y0 + 1, x1 - x0 + 1))

        need = max(max(b[2], b[3]) for b in boxes)
        tile = 128
        while tile < need:
            tile *= 2
        tile = min(tile, min(H, W))
        if tile < need:
            log(t("crop_warn_too_large").format(tag=keytag))

        n = len(sel_polys)
        nb = _bucket(n)
        vb = _bucket(max(len(p) for p in sel_polys), 32)
        lpv = np.zeros((nb, vb, 2), np.float32)
        offs = np.zeros((nb, 2), np.int32)
        cstart = np.zeros((nb, 2), np.int32)
        csize = np.ones((nb, 2), np.int32)
        from ..geom.polygon import pad_polygons
        locals_ = []
        for i, (P, (y0, x0, ch_, cw_)) in enumerate(zip(sel_polys, boxes)):
            oy = min(y0, H - tile)
            ox = min(x0, W - tile)
            offs[i] = (oy, ox)
            cstart[i] = (y0 - oy, x0 - ox)
            csize[i] = (min(ch_, tile), min(cw_, tile))
            # [x, y] -= [ox, oy]
            locals_.append((P - np.array([ox, oy], float)).astype(np.float32))
        if locals_:
            lpv[: len(locals_)] = pad_polygons(locals_, vb)

        norm_g, masks_t, oks = crop_view_tiled(
            jnp.asarray(raw_full), jnp.asarray(lpv), jnp.asarray(offs),
            jnp.asarray(cstart), jnp.asarray(csize),
            lo_p, hi_p, jnp.float32(cfg.gamma),
            tile=tile, mask_outside=cfg.mask_outside,
        )
        norm_g = np.asarray(norm_g)
        masks_t = np.asarray(masks_t)
        oks = np.asarray(oks)

        for i, (roi_i, (y0, x0, ch_, cw_)) in enumerate(zip(roi_indices, boxes)):
            if not oks[i]:
                log(t("crop_warn_norm").format(tag=f"{keytag}_roi{roi_i}"))
                continue
            sy, sx = cstart[i]
            ng = norm_g[i, sy:sy + ch_, sx:sx + cw_]
            lm = masks_t[i, sy:sy + ch_, sx:sx + cw_]

            if cfg.save_png:
                if color_rgb is None:
                    out_img = ng
                else:
                    out_img = np.clip(
                        ng[..., None] * np.asarray(color_rgb, np.float32), 0, 1
                    )
                out_png = os.path.join(
                    png_dir, f"{keytag}_roi{roi_i}_ch{cfg.channel}.png")
                save_png_image(out_img, out_png, dpi=cfg.png_dpi, out_px=out_px,
                               scalebar_um=cfg.sb_len_um if cfg.add_scalebar else None,
                               px_um=cfg.px_um)
                written.append(out_png)
            if cfg.save_tiff16:
                p16 = os.path.join(
                    tif16_dir, f"{keytag}_roi{roi_i}_ch{cfg.channel}.tif")
                tiffio.write_tiff16(p16, (np.clip(ng, 0, 1) * 65535).astype(np.uint16))
                written.append(p16)
            if cfg.save_tiff_raw:
                raw_out = raw_full[y0:y0 + ch_, x0:x0 + cw_].copy()
                if cfg.mask_outside:
                    raw_out[~lm] = 0
                praw = os.path.join(
                    tif_dir, f"{keytag}_roi{roi_i}_ch{cfg.channel}.tif")
                if raw_out.dtype == np.uint16:
                    tiffio.write_tiff16(praw, raw_out)
                else:
                    tiffio.write_tiff32(praw, raw_out.astype(np.float32))
                written.append(praw)
    log(t("done_all"))
    return written
