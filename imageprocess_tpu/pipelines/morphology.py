"""Per-ROI shape metrics pipeline (the reference's MOR_by_ROI).

Reference semantics: src/MOR_by_ROI.py — ``morphology_from_polygon``
(:211-241), ``second_moments``/``major_minor_axes_um`` (:193-209, np.cov
ddof=1 + eigh, a = 4*sqrt(lambda)), hull/shoelace/perimeter (:166-191),
``main`` (:379-517).  The reference deliberately mixes pixel areas
(rasterized mask) with polygon perimeters and hull areas (vertex math) —
preserved as-is (SURVEY §2.2 "morphology metrics").

Device part: mask rasterization + pixel-moment sums on ROI bbox tiles
(two-pass centered sums for f32 accuracy).  Vertex math (perimeter, hull,
shoelace) stays on host — vertex counts are tiny.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core import naming, roiio, tiffio
from ..core.i18n import t
from ..core.naming import ChannelGrammar
from ..geom.polygon import convex_hull, polygon_perimeter, shoelace_area
from ..geom.rasterize import rasterize_polygons
from .intensity import _bucket


@dataclass
class MorConfig:
    px_um: float = 0.223
    sel_ch: int = 1
    include_no_channel: bool = False
    timelapse: bool = False
    save_full: bool = True
    save_crop: bool = True
    mask_outside: bool = False
    add_scalebar: bool = False
    scale_bar_um: Optional[float] = None
    do_xls: bool = True
    grammar: ChannelGrammar = ChannelGrammar.END_ANCHORED
    # crop-PNG canvas geometry: False (default) caps the crop blow-up at 2x
    # (same content, ~4x less PNG encode — the measured wall of the
    # image-output run); True reproduces the reference's fixed 1100-px-wide
    # figure export exactly (MOR_by_ROI.py:480,496).  PARITY.md divergences.
    mpl_canvas: bool = False


@partial(jax.jit, static_argnames=("tile",))
def roi_moments_tiled(local_polys, offsets, roi_valid, tile: int):
    """Per-ROI pixel-moment sums on tiles: area, global centroid (yc, xc),
    and the centered second-moment sums (Sxx, Syy, Sxy).

    Two-pass: centroid first, then centered squares — keeps f32 tree-sums
    at ~1e-6 relative, far inside the 1e-4 parity budget."""
    masks = rasterize_polygons(local_polys, (tile, tile)) & roi_valid[:, None, None]

    def per_roi(mask, off):
        m = mask.astype(jnp.float32)
        n = m.sum()
        nf = jnp.maximum(n, 1.0)
        ys = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1)
        yc = (ys * m).sum() / nf
        xc = (xs * m).sum() / nf
        dy = jnp.where(mask, ys - yc, 0.0)
        dx = jnp.where(mask, xs - xc, 0.0)
        return {
            "area": n,
            "yc": yc + off[0].astype(jnp.float32),
            "xc": xc + off[1].astype(jnp.float32),
            "sxx": (dx * dx).sum(),
            "syy": (dy * dy).sum(),
            "sxy": (dx * dy).sum(),
        }

    return jax.vmap(per_roi)(masks, offsets)


def morphology_rows(polys, shape, px_um: float) -> List[dict]:
    """All metric rows for one frame's polygons — morphology_from_polygon
    parity for every ROI, mask moments computed on device."""
    from ..ops.roistats import choose_tile, tile_offsets, pad_local_polys
    from .intensity import _device_inputs

    H, W = shape
    n = len(polys)
    tile = choose_tile(polys, H, W)
    if tile is not None:
        offs = tile_offsets(polys, H, W, tile)
        pv, offs_pad, valid = pad_local_polys(
            polys, offs, _bucket(n), _bucket(max(len(p) for p in polys), 32)
        )
        moments = jax.device_get(
            roi_moments_tiled(jnp.asarray(pv), jnp.asarray(offs_pad),
                              jnp.asarray(valid), tile)
        )
    else:  # oversized ROI: full-frame tiles
        pv, valid, _, _ = _device_inputs(
            np.zeros((1, H, W), np.float32), polys, None
        )
        offs_pad = np.zeros((pv.shape[0], 2), np.int32)
        moments = jax.device_get(
            roi_moments_tiled(jnp.asarray(pv), jnp.asarray(offs_pad),
                              jnp.asarray(valid), max(H, W))
        )

    rows = []
    for i, poly in enumerate(polys):
        area_px = float(moments["area"][i])
        if area_px == 0:
            rows.append({
                "area_px": 0, "area_um2": 0,
                "perimeter_px": np.nan, "perimeter_um": np.nan,
                "circularity": np.nan, "roundness": np.nan, "solidity": np.nan,
                "major_um": np.nan, "minor_um": np.nan,
                "aspect_ratio": np.nan, "orientation_deg": np.nan,
                "centroid_x": np.nan, "centroid_y": np.nan,
            })
            continue
        area_um2 = area_px * px_um ** 2
        perimeter_px = polygon_perimeter(poly)
        hull = convex_hull(np.asarray(poly, float))
        if hull.shape[0] >= 3:
            hull_area = shoelace_area(hull)
            solidity = area_px / hull_area if hull_area > 0 else np.nan
        else:
            solidity = np.nan
        # np.cov ddof=1 over pixel coords (MOR_by_ROI.py:193-209)
        denom = max(area_px - 1.0, 1e-12)
        cov = np.array([
            [moments["sxx"][i] / denom, moments["sxy"][i] / denom],
            [moments["sxy"][i] / denom, moments["syy"][i] / denom],
        ])
        w, v = np.linalg.eigh(cov)
        lam1, lam2 = w[1], w[0]
        orientation = math.degrees(math.atan2(v[1, 1], v[0, 1]))
        major_um = 4.0 * math.sqrt(max(lam1, 0.0)) * px_um
        minor_um = 4.0 * math.sqrt(max(lam2, 0.0)) * px_um
        aspect = (major_um / minor_um
                  if np.isfinite(major_um) and np.isfinite(minor_um) and minor_um > 0
                  else np.nan)
        circularity = (4.0 * math.pi * area_px / perimeter_px ** 2
                       if perimeter_px > 0 else np.nan)
        roundness = (4.0 * area_um2 / (math.pi * major_um ** 2)
                     if np.isfinite(major_um) and major_um > 0 else np.nan)
        rows.append({
            "area_px": area_px, "area_um2": area_um2,
            "perimeter_px": perimeter_px, "perimeter_um": perimeter_px * px_um,
            "circularity": circularity, "roundness": roundness,
            "solidity": solidity,
            "major_um": major_um, "minor_um": minor_um,
            "aspect_ratio": aspect, "orientation_deg": orientation,
            "centroid_x": float(moments["xc"][i]),
            "centroid_y": float(moments["yc"][i]),
        })
    return rows


MOR_COLS = ["stage", "time", "roi", "img", "channel", "px_um",
            "area_px", "area_um2", "perimeter_px", "perimeter_um",
            "major_um", "minor_um", "aspect_ratio", "orientation_deg",
            "circularity", "roundness", "solidity",
            "centroid_x", "centroid_y"]


def run_morphology(
    folder: str,
    cfg: MorConfig,
    roi_dir: Optional[str] = None,
    out_root: Optional[str] = None,
    log=print,
) -> List[dict]:
    """MOR_by_ROI main loop (src/MOR_by_ROI.py:379-517)."""
    from ..report import render
    from ..report.xlsxlite import write_xlsx, _df_rows

    roi_dir = roi_dir or os.path.join(folder, "roi")
    out_root = out_root or os.path.join(folder, "RES_MOR")
    png_full_dir = os.path.join(out_root, "PNG", "overlay_full")
    png_crop_dir = os.path.join(out_root, "PNG", "overlay_crop")

    files_all = naming.list_tifs(folder)
    files, meta = [], {}
    skipped_noch = skipped_mismatch = 0
    for p in files_all:
        k = naming.parse_tokens(os.path.basename(p), cfg.timelapse, cfg.grammar)
        if k.channel is None:
            if cfg.include_no_channel:
                files.append(p)
                meta[p] = k
            else:
                skipped_noch += 1
        elif k.channel == cfg.sel_ch:
            files.append(p)
            meta[p] = k
        else:
            skipped_mismatch += 1
    log(t("mor_info_files").format(
        total=len(files_all), used=len(files),
        extra=f"no-channel: {skipped_noch} | "
              f"other-channel: {skipped_mismatch}"))

    from ..parallel.runner import PrefetchLoader

    def _load(img_path):
        base = os.path.basename(img_path)
        roi_base = naming.find_roi_basepath(
            roi_dir, base, cfg.timelapse, cfg.grammar, exts=(".json",)
        )
        polys = (roiio.load_roi_polygons(roi_base + ".json")
                 if os.path.exists(roi_base + ".json") else None)
        return img_path, tiffio.read_2d(img_path), polys

    from ..parallel.runner import LoadError

    rows: List[dict] = []
    for item in PrefetchLoader(_load, files, workers=8):
        if isinstance(item, LoadError):
            log(t("err_worker").format(key=os.path.basename(str(item.item)), error=item.error))
            continue
        img_path, img, polys = item
        base = os.path.basename(img_path)
        k = meta[img_path]
        if k.stage is None:
            log(t("mor_skip_parse").format(base=base))
            continue
        S = naming.fmt_stage(k.stage)
        t_code = naming.fmt_time(k.time) if (cfg.timelapse and k.time is not None) else None
        tag = f"{S}_{t_code}" if (cfg.timelapse and t_code is not None) else S
        if not polys:
            log(t("mor_no_roi").format(tag=tag))
            continue

        H, W = img.shape
        mets = morphology_rows(polys, (H, W), cfg.px_um)
        for i, met in enumerate(mets, 1):
            met.update({
                "stage": S, "time": t_code if cfg.timelapse else None,
                "roi": i, "px_um": cfg.px_um, "img": base,
                "channel": cfg.sel_ch,
            })
            rows.append(met)

        if cfg.save_full or cfg.save_crop:
            render.save_morphology_images(
                img=img, polys=polys, mets=mets, tag=tag, cfg=cfg,
                png_full_dir=png_full_dir, png_crop_dir=png_crop_dir,
            )

    if not rows:
        log(t("mor_no_results"))
        return rows

    if cfg.do_xls:
        df = pd.DataFrame(rows)
        for c in MOR_COLS:
            if c not in df.columns:
                df[c] = np.nan
        df = df[MOR_COLS].sort_values(
            ["stage", "time", "roi"], na_position="last"
        ).reset_index(drop=True)
        xls_dir = os.path.join(out_root, "xls")
        os.makedirs(xls_dir, exist_ok=True)
        write_xlsx(os.path.join(xls_dir, "morphology_perROI.xlsx"),
                   {"per_ROI": _df_rows(df)})
        df.to_csv(os.path.join(xls_dir, "morphology_perROI.csv"), index=False)
        log(t("mor_saved").format(path=f"{xls_dir}/morphology_perROI.csv"))
    return rows
