"""FA pipeline tests.

The reference's FA input TIFFs were LFS-stripped from the sample tree, so
numeric parity runs against an in-test numpy/scipy replication of
``analyze_fa_crop`` (src/INT/FA_Analyzer.py:123-195) on synthetic images;
the golden ``S0#_results.csv`` files pin down the CSV schema."""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.ndimage as ndi

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.morphology.binary import disk
from imageprocess_tpu.pipelines.fa import (
    FA_CSV_COLS, FaConfig, analyze_image, merge_fa_report, run_fa_batch,
)


def _synthetic_cell_image(seed=0, shape=(256, 320)):
    """Image with bright FA-like blobs inside a cell polygon."""
    rng = np.random.default_rng(seed)
    H, W = shape
    img = rng.normal(500, 30, shape)
    yy, xx = np.mgrid[0:H, 0:W]
    blob_centers = [(60, 80), (90, 150), (150, 200), (180, 90), (120, 250),
                    (70, 220), (160, 150)]
    for cy, cx in blob_centers:
        r = rng.integers(3, 8)
        img += 4000.0 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
    poly = np.array([[30, 30], [300, 40], [290, 200], [150, 240], [40, 210]],
                    float)  # [x, y]
    return img.astype(np.float32), [poly]


def _ref_analyze(img, rois, cfg: FaConfig):
    """Reference batch loop in numpy/scipy (skimage semantics hand-built)."""
    img_f = img.astype(np.float32)
    m, s = float(np.nanmean(img_f)), float(np.nanstd(img_f))
    bg = float(np.percentile(img_f[::10, ::10], 1.0))
    thr = m + cfg.alpha * s

    from imageprocess_tpu.geom.rasterize import rasterize_polygon_np, EdgeRule

    rows = []
    H, W = img.shape
    for i, poly in enumerate(rois):
        xs, ys = poly[:, 0], poly[:, 1]
        x0 = max(0, int(np.floor(xs.min())) - 5)
        x1 = min(W, int(np.ceil(xs.max())) + 5)
        y0 = max(0, int(np.floor(ys.min())) - 5)
        y1 = min(H, int(np.ceil(ys.max())) + 5)
        crop = img_f[y0:y1, x0:x1]
        pl = poly.copy()
        pl[:, 0] -= x0
        pl[:, 1] -= y0
        mask = rasterize_polygon_np(pl, crop.shape, EdgeRule.MPL)

        bw = (crop > thr) & mask
        if cfg.min_px > 0:
            lab4, n4 = ndi.label(bw)
            sizes = ndi.sum(bw, lab4, np.arange(1, n4 + 1))
            small = np.isin(lab4, np.where(sizes < cfg.min_px)[0] + 1)
            bw = bw & ~small
        if cfg.close_radius > 0:
            se = disk(cfg.close_radius)
            bw = ndi.binary_erosion(
                ndi.binary_dilation(bw, se), se, border_value=1
            )
        lab, n = ndi.label(bw, structure=np.ones((3, 3)))
        for r in range(1, n + 1):
            m_r = lab == r
            area = float(m_r.sum())
            cat = "OK"
            if area < cfg.min_px:
                cat = "Small"
            elif area > cfg.max_px:
                cat = "Large"
            mean_raw = float(crop[m_r].mean())
            mean_corr = max(0.0, mean_raw - bg) if cfg.subtract_bg else mean_raw
            rows.append({"cell": i + 1, "category": cat, "area": area,
                         "mean_int_raw": mean_raw, "mean_int_corr": mean_corr,
                         "bg_level": bg})
    return rows, thr, bg


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("close_radius", [0, 1, 2])
def test_fa_analyze_matches_reference(seed, close_radius):
    img, rois = _synthetic_cell_image(seed)
    cfg = FaConfig(alpha=2.0, min_area_um=0.5, max_area_um=5.0,
                   close_radius=close_radius, px_size=0.112)
    rows, thr, bg, _ = analyze_image(img, rois, cfg)
    ref_rows, ref_thr, ref_bg = _ref_analyze(img, rois, cfg)
    assert abs(thr - ref_thr) / abs(ref_thr) < 1e-5
    assert abs(bg - ref_bg) / max(abs(ref_bg), 1e-9) < 1e-5
    assert len(rows) == len(ref_rows) and len(rows) > 0
    # ndi.label and our label both number in raster order -> rows align
    for ours, ref in zip(rows, ref_rows):
        assert ours["cell"] == ref["cell"]
        assert ours["category"] == ref["category"]
        assert ours["area"] == ref["area"]
        for k in ("mean_int_raw", "mean_int_corr", "bg_level"):
            assert abs(ours[k] - ref[k]) / max(abs(ref[k]), 1e-9) < 1e-4, k


def test_fa_batch_csv_schema_and_master(tmp_path):
    img, rois = _synthetic_cell_image(0)
    img_dir = tmp_path / "imgs"
    roi_dir = tmp_path / "roi"
    out_root = tmp_path / "BND_FA"
    img_dir.mkdir()
    roi_dir.mkdir()
    tiffio.write_tiff16(str(img_dir / "S01_0.tif"), img.astype(np.uint16))
    tiffio.write_tiff16(str(img_dir / "S02_0.tif"), img.astype(np.uint16))
    for tag in ("S01", "S02"):
        roiio.save_roi_bundle(str(roi_dir / f"{tag}.json"), tag, img.shape, rois)

    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    results = run_fa_batch(str(img_dir), str(roi_dir), str(out_root), cfg,
                           log=lambda *_: None)
    assert set(results) == {"S01", "S02"}
    df = pd.read_csv(out_root / "individual_results" / "S01_results.csv")
    # schema parity with the committed golden CSVs
    golden_csv = ("/root/reference/Testsamples/2FA_BND_INT (251127 FA test "
                  "sample)/Python/ANA/e1/BND_FA/individual_results/S01_results.csv")
    if os.path.exists(golden_csv):
        assert list(df.columns) == list(pd.read_csv(golden_csv).columns)
    else:
        assert list(df.columns) == FA_CSV_COLS
    assert (out_root / "FA_Results_Master.xlsx").exists()

    from imageprocess_tpu.report.xlsxlite import read_xlsx
    sheets = read_xlsx(str(out_root / "FA_Results_Master.xlsx"))
    assert set(sheets) == {"File_Summary", "Cell_Summary", "All_Data"}
    fs = sheets["File_Summary"]
    assert fs[0][:4] == ["File", "OK", "Large", "Small"]


def _fa_experiment(tmp_path, n_stages=5):
    img_dir = tmp_path / "imgs"
    roi_dir = tmp_path / "roi"
    img_dir.mkdir()
    roi_dir.mkdir()
    for s in range(1, n_stages + 1):
        img, rois = _synthetic_cell_image(s)
        tiffio.write_tiff16(str(img_dir / f"S{s:02d}_0.tif"),
                            img.astype(np.uint16))
        roiio.save_roi_bundle(str(roi_dir / f"S{s:02d}.json"), f"S{s:02d}",
                              img.shape, rois)
    return img_dir, roi_dir


def test_fa_batched_matches_serial(tmp_path):
    """The streaming batched FA runner (fused global-stats + per-cell
    chain, one dispatch per chunk) reproduces run_fa_batch's CSVs
    EXACTLY, including with a chunk size that doesn't divide the stage
    count."""
    from imageprocess_tpu.pipelines.fa import run_fa_batched

    img_dir, roi_dir = _fa_experiment(tmp_path)
    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    r1 = run_fa_batch(str(img_dir), str(roi_dir), str(tmp_path / "o1"), cfg,
                      log=lambda *_: None)
    r2 = run_fa_batched(str(img_dir), str(roi_dir), str(tmp_path / "o2"),
                        cfg, log=lambda *_: None, batch_size=2)
    assert sorted(r1) == sorted(r2) and len(r1) == 5
    for k in r1:
        pd.testing.assert_frame_equal(r1[k].reset_index(drop=True),
                                      r2[k].reset_index(drop=True))
    assert (tmp_path / "o2" / "FA_Results_Master.xlsx").exists()


def test_fa_batched_sharded_matches_serial(tmp_path):
    """FA tables sharded over the 8-device test mesh == serial rows (DP
    over stages, the FA analogue of the intensity/FRET sharded paths)."""
    import jax

    from imageprocess_tpu.parallel.runner import make_mesh
    from imageprocess_tpu.pipelines.fa import run_fa_batched

    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    img_dir, roi_dir = _fa_experiment(tmp_path, n_stages=6)
    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    r1 = run_fa_batch(str(img_dir), str(roi_dir), str(tmp_path / "o1"), cfg,
                      log=lambda *_: None)
    r2 = run_fa_batched(str(img_dir), str(roi_dir), str(tmp_path / "o2"),
                        cfg, log=lambda *_: None, batch_size=4,
                        mesh=make_mesh(4))
    assert sorted(r1) == sorted(r2)
    for k in r1:
        pd.testing.assert_frame_equal(r1[k].reset_index(drop=True),
                                      r2[k].reset_index(drop=True))


def test_fa_save_ok_only(tmp_path):
    img, rois = _synthetic_cell_image(0)
    cfg = FaConfig(alpha=2.0, min_area_um=0.5, max_area_um=1.0,  # most Large
                   close_radius=1)
    rows, _, _, _ = analyze_image(img, rois, cfg)
    cats = {r["category"] for r in rows}
    assert "Large" in cats  # classification thresholds applied


def test_analyze_with_cell_overrides():
    from imageprocess_tpu.pipelines.fa import analyze_image_with_overrides

    img, rois = _synthetic_cell_image(0)
    rois = rois + [rois[0] + np.array([5.0, 5.0])]  # two cells
    base = FaConfig(alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    rows_a, thr_a, _ = analyze_image_with_overrides(img, rois, base)
    # raise alpha for cell 2 only -> its threshold rises, cell 1 unchanged
    rows_b, thr_b, _ = analyze_image_with_overrides(
        img, rois, base, cell_settings={1: {"alpha": 6.0}})
    assert thr_b[0] == thr_a[0]
    assert thr_b[1] > thr_a[1]
    n_a = sum(1 for r in rows_a if r["cell"] == 2)
    n_b = sum(1 for r in rows_b if r["cell"] == 2)
    assert n_b <= n_a


@pytest.mark.filterwarnings("ignore:Corrupt EXIF data")
def test_fa_batch_isolates_corrupt_file(tmp_path):
    """One unreadable TIFF logs and continues (FA_Analyzer.py:978-981);
    the remaining stages still produce CSVs and the master report runs."""
    img, rois = _synthetic_cell_image(0)
    img_dir = tmp_path / "imgs"
    roi_dir = tmp_path / "roi"
    img_dir.mkdir()
    roi_dir.mkdir()
    (img_dir / "S01_0.tif").write_bytes(b"II*\x00not a real tiff")
    tiffio.write_tiff16(str(img_dir / "S02_0.tif"), img.astype(np.uint16))
    for tag in ("S01", "S02"):
        roiio.save_roi_bundle(str(roi_dir / f"{tag}.json"), tag, img.shape,
                              rois)
    logs = []
    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    results = run_fa_batch(str(img_dir), str(roi_dir), str(tmp_path / "out"),
                           cfg, log=logs.append)
    assert set(results) == {"S02"}
    assert any("S01" in s and ("Failed" in s or "실패" in s) for s in logs)
    assert (tmp_path / "out" / "individual_results"
            / "S02_results.csv").exists()
