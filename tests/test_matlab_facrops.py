"""MATLAB v7.3 boundary interop on the committed golden .mat files, and the
FA crop-export renderer."""

import os

import numpy as np
import pytest

MAT_GOLDEN = ("/root/reference/Testsamples/2FA_BND_INT (251127 FA test sample)"
              "/Matlab/ANA/BND FA/mat/BNDb_e1s1.mat")


def test_matlab_boundaries_golden_file():
    if not os.path.exists(MAT_GOLDEN):
        pytest.skip("golden MATLAB file not available")
    from imageprocess_tpu.core.roiio import load_matlab_boundaries

    polys = load_matlab_boundaries(MAT_GOLDEN)  # bdokcc cell-of-cells
    # e1/S01: the MATLAB pipeline found 2 OK focal adhesions — matching the
    # golden Python CSV's 2 OK rows (BND_FA/individual_results/S01_results.csv)
    assert len(polys) == 2
    for p in polys:
        assert p.ndim == 2 and p.shape[1] == 2 and p.shape[0] >= 3
        # [x, y] convention within the 3200x2200 frame (roi/S01.json shape)
        assert p[:, 0].max() < 3200 + 1 and p[:, 1].max() < 2200 + 1


def test_matlab_missing_dataset():
    if not os.path.exists(MAT_GOLDEN):
        pytest.skip("golden MATLAB file not available")
    from imageprocess_tpu.core.roiio import load_matlab_boundaries

    assert load_matlab_boundaries(MAT_GOLDEN, dataset="nope") == []


def test_export_fa_crops(tmp_path):
    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.pipelines.fa import FaConfig, export_fa_crops

    rng = np.random.default_rng(0)
    H, W = 200, 240
    img = rng.normal(500, 30, (H, W))
    yy, xx = np.mgrid[0:H, 0:W]
    for cy, cx in [(60, 80), (120, 160)]:
        img += 4000 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 50.0)
    img_dir = tmp_path / "img"
    roi_dir = tmp_path / "roi"
    img_dir.mkdir()
    roi_dir.mkdir()
    tiffio.write_tiff16(str(img_dir / "S01_0.tif"),
                        img.clip(0, 65535).astype(np.uint16))
    polys = [np.array([[30, 30], [220, 35], [210, 180], [25, 170]], float)]
    roiio.save_roi_bundle(str(roi_dir / "S01.json"), "S01", (H, W), polys)

    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5, max_area_um=5.0)
    written = export_fa_crops(str(img_dir), str(roi_dir), str(tmp_path / "out"),
                              cfg, dpi=100, log=lambda *_: None)
    assert written == [str(tmp_path / "out" / "crops_export" / "S01" / "Cell_1.png")]
    from PIL import Image
    im = Image.open(written[0])
    assert im.size[0] > 50


def test_save_fa_figs(tmp_path):
    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.pipelines.fa import FaConfig, save_fa_figs

    rng = np.random.default_rng(0)
    H, W = 160, 200
    img = rng.normal(500, 30, (H, W))
    yy, xx = np.mgrid[0:H, 0:W]
    img += 4000 * np.exp(-((yy - 80) ** 2 + (xx - 100) ** 2) / 40.0)
    img_dir = tmp_path / "img"
    roi_dir = tmp_path / "roi"
    img_dir.mkdir()
    roi_dir.mkdir()
    tiffio.write_tiff16(str(img_dir / "S01_0.tif"),
                        img.clip(0, 65535).astype(np.uint16))
    roiio.save_roi_bundle(str(roi_dir / "S01.json"), "S01", (H, W),
                          [np.array([[20, 20], [180, 25], [175, 140], [15, 130]],
                                    float)])
    cfg = FaConfig(channel=0, alpha=2.0, min_area_um=0.5)
    written = save_fa_figs(str(img_dir), str(roi_dir), str(tmp_path / "out"),
                           cfg, dpi=60, log=lambda *_: None)
    assert written and os.path.exists(written[0])
    assert written[0].endswith("S01_FA.png")
