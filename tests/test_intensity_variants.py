"""Intensity pipeline variant configs: timelapse pivot matrices,
roi_union background scope, hist-mode background, per-channel percentiles —
each vs a numpy replication of the reference math."""

import os

import numpy as np
import pandas as pd
import pytest
from matplotlib.path import Path as MplPath

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.intensity import IntensityConfig, run_intensity
from imageprocess_tpu.report.xlsxlite import read_xlsx


def _rasterize(poly, shape):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    return MplPath(np.asarray(poly, float)).contains_points(pts).reshape(H, W)


@pytest.fixture()
def timelapse_ds(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 120, 160
    polys = [np.array([[20, 20], [70, 25], [65, 80], [15, 75]], float),
             np.array([[90, 60], [140, 65], [135, 110], [85, 105]], float)]
    imgs = {}
    for t in range(3):
        for ch in (1, 2):
            img = rng.integers(10, 3000, (H, W)).astype(np.uint16)
            tiffio.write_tiff16(str(tmp_path / f"S01_t{t:02d}_{ch}.TIF"), img)
            imgs[(t, ch)] = img
        roiio.save_roi_bundle(str(tmp_path / "roi" / f"S01_t{t:02d}.json"),
                              f"S01_t{t:02d}", (H, W), polys)
    return tmp_path, imgs, polys


def test_timelapse_pivot_matrices(timelapse_ds, tmp_path_factory):
    folder, imgs, polys = timelapse_ds
    out = tmp_path_factory.mktemp("tl_out")
    cfg = IntensityConfig(channels=(1, 2), timelapse=True)
    rows = run_intensity(str(folder), cfg, out_root=str(out), log=lambda *_: None)
    assert len(rows) == 3 * 2  # 3 times x 2 ROIs
    df = pd.read_csv(out / "xls" / "fluor_intensity_perROI.csv")
    assert set(df["time"]) == {"t00", "t01", "t02"}
    assert set(df["time_idx"]) == {0, 1, 2}
    assert set(df["roi_lab"]) == {"s1c1", "s1c2"}

    sheets = read_xlsx(str(out / "xls" / "fluor_intensity_perROI.xlsx"))
    assert "ch1_mean_matrix" in sheets and "ch2_median_matrix" in sheets
    mat = sheets["ch1_mean_matrix"]
    assert mat[0] == ["time_idx", "s1c1", "s1c2"]
    assert len(mat) == 4  # header + 3 timepoints

    # value parity vs numpy reference for t01 / roi2 / ch1
    img = imgs[(1, 1)].astype(np.float32)
    bg = np.percentile(img.ravel()[::4], 1.0)
    bc = np.clip(img - bg, 0, None)
    m = _rasterize(polys[1], img.shape)
    want = float(bc[m].mean())
    got = float(df[(df.time == "t01") & (df.roi == 2)]["ch1_mean"].iloc[0])
    assert abs(got - want) / abs(want) < 1e-4


def test_roi_union_scope_and_per_channel_p(timelapse_ds, tmp_path_factory):
    folder, imgs, polys = timelapse_ds
    out = tmp_path_factory.mktemp("ru_out")
    cfg = IntensityConfig(channels=(1, 2), timelapse=True,
                          bg_scope="roi_union",
                          per_channel_p={1: 2.0, 2: 0.5}, do_xls=False)
    rows = run_intensity(str(folder), cfg, out_root=str(out), log=lambda *_: None)
    img = imgs[(0, 1)].astype(np.float32)
    union = _rasterize(polys[0], img.shape) | _rasterize(polys[1], img.shape)
    vals = img[union][::4]
    bg = np.percentile(vals, 2.0)
    r = rows[0]
    assert abs(r["ch1_bg"] - bg) / max(bg, 1e-9) < 1e-4
    assert r["ch1_p"] == 2.0 and r["ch2_p"] == 0.5
    bc = np.clip(img - bg, 0, None)
    m = _rasterize(polys[0], img.shape)
    assert abs(r["ch1_mean"] - bc[m].mean()) / abs(bc[m].mean()) < 1e-4


def test_hist_mode_background(timelapse_ds, tmp_path_factory):
    folder, imgs, polys = timelapse_ds
    out = tmp_path_factory.mktemp("hm_out")
    cfg = IntensityConfig(channels=(1,), timelapse=True, bg_mode="hist-mode",
                          bg_stride=1, do_xls=False)
    rows = run_intensity(str(folder), cfg, out_root=str(out), log=lambda *_: None)
    img = imgs[(0, 1)].astype(np.float32)
    vals = img.ravel()
    hist, bins = np.histogram(vals, bins=2048)
    cdf = np.cumsum(hist).astype(float)
    cdf /= cdf[-1]
    idx = int(np.searchsorted(cdf, 0.01, side="left"))
    thr = bins[-1] if idx >= len(bins) - 1 else 0.5 * (bins[idx] + bins[idx + 1])
    assert abs(rows[0]["ch1_bg"] - thr) / max(abs(thr), 1e-9) < 1e-3


def test_subset_and_cancel(timelapse_ds, tmp_path_factory):
    folder, imgs, polys = timelapse_ds
    out = tmp_path_factory.mktemp("sub_out")
    cfg = IntensityConfig(channels=(1,), timelapse=True,
                          subset_stage=1, subset_time=1, do_xls=False)
    rows = run_intensity(str(folder), cfg, out_root=str(out), log=lambda *_: None)
    assert {r["time"] for r in rows} == {"t01"} and len(rows) == 2

    # cancel after the first key
    seen = []
    cfg2 = IntensityConfig(channels=(1,), timelapse=True, do_xls=False)
    rows2 = run_intensity(str(folder), cfg2, out_root=str(out),
                          log=lambda *_: None,
                          cancel=lambda: len(seen) >= 1 or seen.append(1))
    assert len(rows2) <= 4  # stopped early (3 keys x 2 ROIs = 6 total)


def test_save_raw_crop_tif(timelapse_ds, tmp_path_factory):
    from imageprocess_tpu.report.render import PanelPngOptions
    from PIL import Image

    folder, imgs, polys = timelapse_ds
    out = tmp_path_factory.mktemp("raw_out")
    cfg = IntensityConfig(
        channels=(1,), timelapse=True, do_xls=False, do_png=True,
        save_raw_crop_tif=True, subset_stage=1, subset_time=0,
        png_full=PanelPngOptions(enabled=False),
        png_crop=PanelPngOptions(enabled=True, dpi=50), fixed_crop=False,
    )
    run_intensity(str(folder), cfg, out_root=str(out), log=lambda *_: None)
    raw_path = out / "TIFF" / "S01_t00_roi1_ch1_raw.tif"
    assert raw_path.exists()
    raw = np.array(Image.open(raw_path))
    # exact raw-value crop of the bbox+pad window (reference :1078-1089)
    P = polys[0]
    H, W = 120, 160
    pad = max(10, int(0.05 * max(W, H)))
    x0 = max(int(P[:, 0].min()) - pad, 0); x1 = min(int(P[:, 0].max()) + pad, W - 1)
    y0 = max(int(P[:, 1].min()) - pad, 0); y1 = min(int(P[:, 1].max()) + pad, H - 1)
    assert np.array_equal(raw, imgs[(0, 1)][y0:y1 + 1, x0:x1 + 1].astype(np.float32))


def test_png_mask_roi_path(tmp_path):
    """PNG union-mask ROIs (no JSON): single roi=1 row over the mask
    (Fluor_INT.py:405-441, 523-530)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    H, W = 100, 140
    img = rng.integers(10, 2000, (H, W)).astype(np.uint16)
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"), img)
    mask = np.zeros((H, W), np.uint8)
    mask[30:70, 40:100] = 255
    (tmp_path / "roi").mkdir()
    Image.fromarray(mask).save(tmp_path / "roi" / "S01.png")

    cfg = IntensityConfig(channels=(1,), do_xls=False)
    rows = run_intensity(str(tmp_path), cfg, out_root=str(tmp_path / "RES"),
                         log=lambda *_: None)
    assert len(rows) == 1 and rows[0]["roi"] == 1
    assert rows[0]["area_px"] == 40 * 60
    bg = np.percentile(img.astype(np.float32).ravel()[::4], 1.0)
    bc = np.clip(img.astype(np.float32) - bg, 0, None)
    want = bc[mask > 0].mean()
    assert abs(rows[0]["ch1_mean"] - want) / want < 1e-4
