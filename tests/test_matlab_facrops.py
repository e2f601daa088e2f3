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


# --- legacy MATLAB boundary integration (FA_Analyzer.py:105-117, 650-655,
# 747-749): stage-tag matching + magenta dashed overlay through the CLI -----

def _write_mat_v73(path, cells):
    """Craft a MATLAB-v7.3-layout HDF5 file: dataset ``bdokcc`` is a
    (ncells, 1) cell-of-cells of object references, each inner cell a
    (nfa, 1) reference array onto (2, N) [y; x] coordinate data — the
    layout load_matlab_boundaries / the reference parser walk."""
    import h5py

    with h5py.File(path, "w") as f:
        refs = f.create_group("#refs#")
        outer = []
        for i, polys in enumerate(cells):
            inner = []
            for j, p in enumerate(polys):
                p = np.asarray(p, float)  # (N, 2) [x, y]
                d = refs.create_dataset(f"c{i}_{j}", data=p[:, [1, 0]].T)
                inner.append(d.ref)
            cell = refs.create_dataset(
                f"cell{i}",
                data=np.array(inner, dtype=h5py.ref_dtype)[:, None])
            outer.append(cell.ref)
        f.create_dataset(
            "bdokcc", data=np.array(outer, dtype=h5py.ref_dtype)[:, None])


def test_write_mat_roundtrip(tmp_path):
    from imageprocess_tpu.core.roiio import load_matlab_boundaries

    p1 = np.array([[10.0, 20.0], [40.0, 22.0], [38.0, 50.0]])
    p2 = np.array([[60.0, 60.0], [90.0, 62.0], [88.0, 95.0], [58.0, 92.0]])
    _write_mat_v73(str(tmp_path / "BNDb_e1s1.mat"), [[p1], [p2]])
    polys = load_matlab_boundaries(str(tmp_path / "BNDb_e1s1.mat"))
    assert len(polys) == 2
    np.testing.assert_allclose(polys[0], p1)
    np.testing.assert_allclose(polys[1], p2)


def test_find_matching_mat(tmp_path):
    from imageprocess_tpu.core.roiio import find_matching_mat

    d = tmp_path / "mat"
    d.mkdir()
    assert find_matching_mat(str(tmp_path / "nope"), "S01") is None
    assert find_matching_mat(str(d), "S01") is None
    # fuzzy: s_tag S01 -> first integer 1 -> matches *s1.mat
    (d / "BNDb_e1s1.mat").write_bytes(b"")
    assert find_matching_mat(str(d), "S01") == str(d / "BNDb_e1s1.mat")
    # BNDb_{tag} beats fuzzy; exact {tag} beats both (reference order)
    (d / "BNDb_S01.mat").write_bytes(b"")
    assert find_matching_mat(str(d), "S01") == str(d / "BNDb_S01.mat")
    (d / "S01.mat").write_bytes(b"")
    assert find_matching_mat(str(d), "S01") == str(d / "S01.mat")
    assert find_matching_mat(str(d), "S99") is None


def test_find_matching_mat_golden():
    """S01 resolves to BNDb_e1s1.mat in the golden mat tree by the fuzzy
    s{N} rule (no exact/BNDb_S01 file exists there)."""
    if not os.path.exists(MAT_GOLDEN):
        pytest.skip("golden MATLAB file not available")
    from imageprocess_tpu.core.roiio import find_matching_mat

    assert find_matching_mat(os.path.dirname(MAT_GOLDEN), "S01") == MAT_GOLDEN


def test_fa_cli_mat_overlay(tmp_path):
    """`fa --figs --mat-dir` end-to-end: the stage-tag-matched boundaries
    appear as magenta pixels in the overview figure (and do not without
    --mat-dir)."""
    from PIL import Image

    from imageprocess_tpu.cli import main
    from imageprocess_tpu.core import roiio, tiffio

    rng = np.random.default_rng(0)
    H, W = 160, 200
    img = rng.normal(500, 30, (H, W))
    yy, xx = np.mgrid[0:H, 0:W]
    img += 4000 * np.exp(-((yy - 80) ** 2 + (xx - 100) ** 2) / 40.0)
    img_dir = tmp_path / "img"
    roi_dir = tmp_path / "roi"
    mat_dir = tmp_path / "mat"
    for d in (img_dir, roi_dir, mat_dir):
        d.mkdir()
    tiffio.write_tiff16(str(img_dir / "S01_0.tif"),
                        img.clip(0, 65535).astype(np.uint16))
    roiio.save_roi_bundle(str(roi_dir / "S01.json"), "S01", (H, W),
                          [np.array([[20, 20], [180, 25], [175, 140],
                                     [15, 130]], float)])
    # boundaries inside the frame; matched via the fuzzy s1 rule like the
    # reference's BNDb_e1s1.mat
    _write_mat_v73(str(mat_dir / "BNDb_e1s1.mat"), [[
        np.array([[30.0, 40.0], [120.0, 45.0], [110.0, 110.0], [25.0, 100.0]]),
    ]])

    def run(out, extra):
        rc = main(["fa", str(img_dir), "--roi-dir", str(roi_dir),
                   "--out", str(out), "--channel", "0", "--alpha", "2.0",
                   "--min-area-um", "0.5", "--figs", "--no-master",
                   "--lang", "en"] + extra)
        assert rc == 0
        fig = out / "fig" / "S01_FA.png"
        assert fig.exists()
        return np.asarray(Image.open(fig).convert("RGB")).astype(int)

    def magenta(px):
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        return ((r > 180) & (b > 180) & (g < 100)).sum()

    with_mat = run(tmp_path / "out_mat", ["--mat-dir", str(mat_dir)])
    without = run(tmp_path / "out_plain", [])
    assert magenta(without) == 0
    assert magenta(with_mat) > 50  # the dashed boundary is actually drawn
