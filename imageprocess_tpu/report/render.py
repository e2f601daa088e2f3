"""PNG / TIFF image exports (matplotlib on host, fed by device results).

Visual-output parity with the reference:

- single-color black->color colormaps: src/INT/Fluor_INT.py:556-583
- scalebar (margins, clamping, label): src/INT/Fluor_INT.py:588-613
- inset 2/3-height colorbar: src/INT/Fluor_INT.py:615-640
- ``save_png_colormap`` black-background figure writer: Fluor_INT.py:642-675
- worker TIF32/TIF16/PNG-full/PNG-crop block: Fluor_INT.py:917-1135
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import matplotlib

matplotlib.use("Agg")
import matplotlib as mpl  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib.colors import LinearSegmentedColormap  # noqa: E402

from ..core import tiffio  # noqa: E402
from ..geom.rasterize import rasterize_polygon_np  # noqa: E402

COLOR_CHOICES = ["Cyan", "Yellow", "Green", "Red", "Blue", "Magenta", "Grayscale"]
CMAP_CHOICES = ["jet", "turbo", "viridis", "plasma", "magma", "inferno", "cividis"]
SB_ANCHORS = ["br", "bl", "tr", "tl"]

_SINGLE_RGB = {
    "cyan": (0.0, 1.0, 1.0),
    "yellow": (1.0, 1.0, 0.0),
    "green": (0.0, 1.0, 0.0),
    "red": (1.0, 0.0, 0.0),
    "blue": (0.0, 0.0, 1.0),
    "magenta": (1.0, 0.0, 1.0),
}


def get_cmap_for_color(color_name: Optional[str]):
    """Black -> single-color gradient colormap; Grayscale -> 'gray'."""
    if color_name is None or color_name.lower() == "grayscale":
        return "gray"
    rgb = _SINGLE_RGB.get(color_name.lower())
    if rgb is None:
        return "gray"
    r, g, b = rgb
    return LinearSegmentedColormap(
        "single_" + color_name,
        segmentdata={
            "red": ((0.0, 0.0, 0.0), (1.0, r, r)),
            "green": ((0.0, 0.0, 0.0), (1.0, g, g)),
            "blue": ((0.0, 0.0, 0.0), (1.0, b, b)),
        },
    )


def draw_scalebar(ax, img_w, img_h, bar_px, bar_um, lw=3, anchor="br", font_size=10):
    if anchor not in SB_ANCHORS:
        anchor = "br"
    margin_x = int(img_w * 0.05)
    margin_y = int(img_h * 0.05)
    x_start = img_w - margin_x - bar_px if anchor in ("br", "tr") else margin_x
    y = img_h - margin_y if anchor in ("br", "bl") else margin_y
    x_end = x_start + bar_px
    ax.plot([x_start, x_end], [y, y], color="w", linewidth=lw)
    dy = max(10, int(0.02 * img_h))
    ax.text(
        (x_start + x_end) / 2,
        y - dy if anchor in ("br", "bl") else y + dy,
        f"{bar_um:.0f} µm",
        color="w",
        ha="center",
        va="bottom" if anchor in ("br", "bl") else "top",
        fontsize=font_size,
        bbox=dict(facecolor="black", alpha=0.4, pad=1, edgecolor="none"),
    )


def add_short_colorbar(fig, ax, vmin, vmax, cmap="jet", label="Intensity (a.u.)"):
    bbox = ax.get_position()
    cb_h = bbox.height * (2.0 / 3.0)
    cb_ax = fig.add_axes(
        [bbox.x1 + 0.01, bbox.y0 + (bbox.height - cb_h) / 2.0, 0.02, cb_h]
    )
    cb_ax.set_facecolor("black")
    norm = mpl.colors.Normalize(vmin=vmin, vmax=vmax)
    cmap_obj = plt.get_cmap(cmap) if isinstance(cmap, str) else cmap
    cb = mpl.colorbar.ColorbarBase(
        cb_ax, cmap=cmap_obj, norm=norm, orientation="vertical"
    )
    cb.set_label(label, rotation=90, color="w")
    cb.set_ticks([vmin, vmax])
    cb.ax.set_yticklabels([f"{vmin:.2f}", f"{vmax:.2f}"], color="w")
    cb.ax.tick_params(color="w", labelcolor="w", length=3)
    cb.outline.set_edgecolor("w")


def save_png_colormap(
    img2d,
    out_path,
    vmin=None,
    vmax=None,
    cmap="jet",
    mask=None,
    scalebar_um=None,
    px_um=None,
    show_colorbar=False,
    dpi=300,
    out_px=None,
    cbar_label="Intensity (a.u.)",
    bar_anchor="br",
    bar_font=10,
):
    """Black-background borderless PNG with optional mask transparency,
    scalebar and inset colorbar (Fluor_INT.py:642-675)."""
    fig, ax = plt.subplots()
    ax.set_facecolor("black")
    fig.patch.set_facecolor("black")
    shown = np.array(img2d, copy=True)
    if mask is not None:
        shown = np.ma.array(shown, mask=~mask)
        cmap_obj = (plt.get_cmap(cmap) if isinstance(cmap, str) else cmap).copy()
        cmap_obj.set_bad(alpha=0.0)
        ax.imshow(shown, cmap=cmap_obj, vmin=vmin, vmax=vmax)
    else:
        ax.imshow(shown, cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_axis_off()
    if scalebar_um is not None and px_um is not None and scalebar_um > 0:
        H, W = shown.shape[:2]
        bar_px = int(round(float(scalebar_um) / float(px_um)))
        bar_px = max(2, min(bar_px, int(0.8 * W)))
        draw_scalebar(ax, W, H, bar_px, bar_px * float(px_um),
                      anchor=bar_anchor, font_size=bar_font)
    if show_colorbar and vmin is not None and vmax is not None:
        add_short_colorbar(fig, ax, vmin, vmax, cmap=cmap, label=cbar_label)
    fig.tight_layout(pad=0)
    if out_px:
        fig.set_size_inches(out_px[0] / dpi, out_px[1] / dpi)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=dpi, facecolor=fig.get_facecolor())
    plt.close(fig)


def _auto_minmax_np(vals: np.ndarray, p_lo: float, p_hi: float):
    vals = vals[np.isfinite(vals)]
    if vals.size == 0:
        return 0.0, 1.0
    lo = float(np.percentile(vals, p_lo))
    hi = float(np.percentile(vals, p_hi))
    if hi <= lo:
        hi = lo + 1e-6
    return lo, hi


@dataclass
class PanelPngOptions:
    """One PNG output panel (the reference's full_* / crop_* GUI group)."""

    enabled: bool = True
    cmap_on: bool = False
    cmap: str = "jet"
    cmin: str = ""      # "" = auto from percentiles
    cmax: str = ""
    mask_outside: bool = False
    colorbar: bool = False
    scalebar_um: Optional[float] = None
    sb_anchor: str = "br"
    sb_font: int = 10
    dpi: int = 300

    def vminmax(self, vals: np.ndarray, auto_lo: float, auto_hi: float):
        """get_vminmax semantics (Fluor_INT.py:956-966): explicit bounds win;
        bad/missing bounds fall back to percentile auto-range; no colormap
        mode -> autoscale imshow (None, None)."""
        if not self.cmap_on:
            return None, None
        vmin = float(self.cmin) if self.cmin != "" else None
        vmax = float(self.cmax) if self.cmax != "" else None
        if vmin is None or vmax is None or vmax <= vmin:
            lo, hi = _auto_minmax_np(vals, auto_lo, auto_hi)
            vmin = lo if vmin is None else vmin
            if vmax is None or vmax <= vmin:
                vmax = hi
        return vmin, vmax


def save_intensity_images(extras: dict, cfg, out_root: str) -> None:
    """TIF32 + TIF16-preview + PNG full/crop exports for one (stage, time)
    key (worker block Fluor_INT.py:917-1135)."""
    stid = extras["stid"]
    chs: Sequence[int] = extras["chs"]
    imgs_bc: np.ndarray = extras["imgs_bc"]
    polys = extras["polys"]
    union_mask = extras["union_mask"]
    H, W = extras["shape"]

    if polys is not None:
        union = np.zeros((H, W), bool)
        for P in polys:
            union |= rasterize_polygon_np(P, (H, W))
    elif union_mask is not None:
        union = np.asarray(union_mask, bool)
    else:
        union = None

    tif32_dir = os.path.join(out_root, "TIFF")
    tif16_dir = os.path.join(out_root, "TIFF16")
    png_root = os.path.join(out_root, "PNG")

    if cfg.do_tif:
        os.makedirs(tif32_dir, exist_ok=True)
        os.makedirs(tif16_dir, exist_ok=True)
        for ci, ch in enumerate(chs):
            bc = imgs_bc[ci]
            img_to_save = bc
            if cfg.tif_mask_outside and union is not None:
                img_to_save = np.where(union, bc, 0.0).astype(np.float32)
            tiffio.write_tiff32(
                os.path.join(tif32_dir, f"{stid}_ch{ch}_bgcorr.tif"), img_to_save
            )
            vals = img_to_save[np.isfinite(img_to_save)]
            if vals.size > 0:
                lo, hi = _auto_minmax_np(vals, cfg.auto_lo, cfg.auto_hi)
                tiffio.write_tiff16(
                    os.path.join(tif16_dir, f"{stid}_ch{ch}_bgcorr_preview.tif"),
                    tiffio.normalize_to_u16(img_to_save, lo, hi),
                )

    if not cfg.do_png:
        return

    full_opt: PanelPngOptions = cfg.png_full
    crop_opt: PanelPngOptions = cfg.png_crop
    for ci, ch in enumerate(chs):
        bc = imgs_bc[ci]
        vals = bc[np.isfinite(bc)]
        color = cfg.channel_colors.get(ch, "Grayscale")

        if full_opt.enabled:
            cmap_full = full_opt.cmap if full_opt.cmap_on else get_cmap_for_color(color)
            vmin, vmax = full_opt.vminmax(vals, cfg.auto_lo, cfg.auto_hi)
            save_png_colormap(
                bc,
                os.path.join(png_root, "full", f"ch{ch}", f"{stid}_ch{ch}.png"),
                vmin=vmin, vmax=vmax, cmap=cmap_full,
                mask=union if full_opt.mask_outside else None,
                scalebar_um=full_opt.scalebar_um, px_um=cfg.px_um,
                show_colorbar=bool(full_opt.colorbar and full_opt.cmap_on),
                dpi=full_opt.dpi, cbar_label=f"ch{ch} Intensity",
                bar_anchor=full_opt.sb_anchor, bar_font=full_opt.sb_font,
            )

        if crop_opt.enabled and (polys is not None or union is not None):
            cmap_crop = crop_opt.cmap if crop_opt.cmap_on else get_cmap_for_color(color)
            crop_dir = os.path.join(png_root, "crop", f"ch{ch}")
            items = []
            if polys is not None:
                for i, P in enumerate(polys, 1):
                    items.append((i, np.asarray(P), None))
            else:
                ys, xs = np.where(union)
                if ys.size:
                    items.append((1, None, (ys, xs)))
            for i, P, coords in items:
                pad = max(10, int(0.05 * max(W, H)))
                if P is not None:
                    minx, maxx = P[:, 0].min(), P[:, 0].max()
                    miny, maxy = P[:, 1].min(), P[:, 1].max()
                else:
                    ys, xs = coords
                    minx, maxx, miny, maxy = xs.min(), xs.max(), ys.min(), ys.max()
                x0 = max(int(minx) - pad, 0)
                x1 = min(int(maxx) + pad, W - 1)
                y0 = max(int(miny) - pad, 0)
                y1 = min(int(maxy) + pad, H - 1)
                if P is not None:
                    P2 = P.copy()
                    P2[:, 0] -= x0
                    P2[:, 1] -= y0
                    local_mask = rasterize_polygon_np(P2, (y1 - y0 + 1, x1 - x0 + 1))
                else:
                    local_mask = union[y0:y1 + 1, x0:x1 + 1]
                crop = bc[y0:y1 + 1, x0:x1 + 1]
                use_vals = crop[local_mask] if crop_opt.mask_outside else crop[np.isfinite(crop)]
                vmin, vmax = crop_opt.vminmax(use_vals, cfg.auto_lo, cfg.auto_hi)
                out_px = (cfg.crop_size, cfg.crop_size) if cfg.fixed_crop else None
                save_png_colormap(
                    crop,
                    os.path.join(crop_dir, f"{stid}_roi{i}_ch{ch}.png"),
                    vmin=vmin, vmax=vmax, cmap=cmap_crop,
                    mask=local_mask if crop_opt.mask_outside else None,
                    scalebar_um=crop_opt.scalebar_um, px_um=cfg.px_um,
                    show_colorbar=bool(crop_opt.colorbar and crop_opt.cmap_on),
                    dpi=crop_opt.dpi, out_px=out_px,
                    cbar_label=f"ch{ch} Intensity",
                    bar_anchor=crop_opt.sb_anchor, bar_font=crop_opt.sb_font,
                )
