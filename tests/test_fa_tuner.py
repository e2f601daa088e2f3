"""Headless tests of the interactive FA tuner core (apps.fa_tune)."""

import numpy as np
import pandas as pd

from imageprocess_tpu.apps.fa_tune import FATuner
from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.fa import FaConfig, restore_cell_settings


def _dataset(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 220, 280
    img = rng.normal(500, 30, (H, W))
    yy, xx = np.mgrid[0:H, 0:W]
    for cy, cx in [(60, 70), (70, 200), (160, 120)]:
        img += 4000 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 50.0)
    tiffio.write_tiff16(str(tmp_path / "S01_0.tif"),
                        img.clip(0, 65535).astype(np.uint16))
    polys = [np.array([[20, 20], [130, 25], [125, 120], [15, 115]], float),
             np.array([[150, 20], [270, 25], [265, 120], [145, 115]], float)]
    (tmp_path / "roi").mkdir()
    roiio.save_roi_bundle(str(tmp_path / "roi" / "S01.json"), "S01",
                          (H, W), polys)
    return tmp_path


def test_fa_tuner_flow(tmp_path):
    folder = _dataset(tmp_path)
    out = folder / "out"
    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.3, max_area_um=10.0)
    t = FATuner(str(folder / "S01_0.tif"), str(folder / "roi" / "S01.json"),
                "S01", str(out), cfg, log=lambda *_: None)
    assert t.fa_count() >= 2

    # click inside cell 1, raise its alpha -> fewer/equal FAs in that cell
    assert t.select_cell_at(60, 60) == 0
    before = t.fa_count(0)
    other_before = t.fa_count(1)
    t.set_params(alpha=8.0)
    assert t.fa_count(0) <= before
    assert t.fa_count(1) == other_before  # other cell unaffected

    # click outside any cell clears the selection
    assert t.select_cell_at(5, 200) is None

    path = t.save()
    df = pd.read_csv(path)
    alphas = dict(zip(df["Cell_ID"], df["Used_Alpha"]))
    if 1 in alphas:
        assert alphas[1] == 8.0
    if 2 in alphas:
        assert alphas[2] == 2.0

    # settings round-trip: a fresh tuner restores the per-cell override
    restored = restore_cell_settings(str(out), "S01")
    assert restored.get(0, {}).get("alpha") == 8.0
    t2 = FATuner(str(folder / "S01_0.tif"), str(folder / "roi" / "S01.json"),
                 "S01", str(out), cfg, log=lambda *_: None)
    assert t2.cell_settings.get(0, {}).get("alpha") == 8.0


def test_fa_tuner_save_with_zero_fas(tmp_path):
    """Raising alpha until no FAs survive must still write a schema-stable
    CSV (pd.DataFrame([]) has no columns; the FA_CSV_COLS selection used
    to KeyError and the tuned settings were lost)."""
    from imageprocess_tpu.pipelines.fa import FA_CSV_COLS

    rng = np.random.default_rng(3)
    H, W = 120, 140
    img = rng.normal(500, 5, (H, W))  # featureless: mu+alpha*sigma finds 0
    tiffio.write_tiff16(str(tmp_path / "S01_0.tif"),
                        img.clip(0, 65535).astype(np.uint16))
    (tmp_path / "roi").mkdir()
    polys = [np.array([[20, 20], [120, 25], [115, 100], [15, 95]], float)]
    roiio.save_roi_bundle(str(tmp_path / "roi" / "S01.json"), "S01",
                          (H, W), polys)
    cfg = FaConfig(channel=0, alpha=8.0, min_area_um=0.3, max_area_um=10.0)
    t = FATuner(str(tmp_path / "S01_0.tif"),
                str(tmp_path / "roi" / "S01.json"),
                "S01", str(tmp_path / "out"), cfg, log=lambda *_: None)
    assert t.fa_count() == 0
    path = t.save()
    df = pd.read_csv(path)
    assert list(df.columns) == list(FA_CSV_COLS) and len(df) == 0


def test_fa_tuner_boost_zoom_mat(tmp_path):
    """Display boost (FA_Analyzer.py:722-744), auto-zoom bounds (:751-760),
    and the legacy MATLAB boundary load (:650-655) — headless core."""
    import h5py

    folder = _dataset(tmp_path)
    mat_dir = folder / "mat"
    mat_dir.mkdir()
    poly = np.array([[30.0, 30.0], [100.0, 35.0], [95.0, 100.0]])
    with h5py.File(str(mat_dir / "BNDb_S01.mat"), "w") as f:
        refs = f.create_group("#refs#")
        d = refs.create_dataset("c0", data=poly[:, [1, 0]].T)  # (2, N) [y; x]
        cell = refs.create_dataset(
            "cell0", data=np.array([d.ref], dtype=h5py.ref_dtype)[:, None])
        f.create_dataset(
            "bdokcc", data=np.array([cell.ref], dtype=h5py.ref_dtype)[:, None])

    t = FATuner(str(folder / "S01_0.tif"), str(folder / "roi" / "S01.json"),
                "S01", str(folder / "out"), FaConfig(channel=0),
                mat_dir=str(mat_dir), log=lambda *_: None)
    assert len(t.mat_polys) == 1
    np.testing.assert_allclose(t.mat_polys[0], poly)

    full = float(t.img.max()) - float(t.img.min())
    vmin, vmax = t.display_range()
    assert vmin == float(t.img.min()) and np.isclose(vmax - vmin, full)
    t.visual_boost = 15   # brighten: range / 16
    _, vmax = t.display_range()
    assert np.isclose(vmax - vmin, full / 16.0)
    t.visual_boost = -15  # darken: range * 16
    _, vmax = t.display_range()
    assert np.isclose(vmax - vmin, full * 16.0)

    assert t.zoom_bounds() is None
    t.selected = 0
    (x0, x1), (y0, y1) = t.zoom_bounds()
    roi = t.rois[0]
    pad_x = (roi[:, 0].max() - roi[:, 0].min()) * 0.2 + 20
    pad_y = (roi[:, 1].max() - roi[:, 1].min()) * 0.2 + 20
    assert np.isclose(x0, roi[:, 0].min() - pad_x)
    assert np.isclose(x1, roi[:, 0].max() + pad_x)
    # y limits inverted for image coordinates
    assert np.isclose(y0, roi[:, 1].max() + pad_y)
    assert np.isclose(y1, roi[:, 1].min() - pad_y)
