"""Nesprin2 rim-FRET pipeline parity vs an in-test numpy replication of the
reference math (src/FRET/Nesprin2_FRET_Builder.py:1331-1736) on golden
inputs (ch2 = donor, ch3 = FRET).  Covers: rim masking (EDT), QC
(saturation + ratio clip), annulus local-BG re-ratio, spectral correction,
dual ratio orientation, and the report files."""

import os

import numpy as np
import pytest
import scipy.ndimage as ndi
from matplotlib.path import Path as MplPath

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.nesprin2 import Nesprin2Config, run_nesprin2


def _rasterize(poly, shape):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    return MplPath(np.asarray(poly, float)).contains_points(pts).reshape(H, W)


def _load(folder):
    D = tiffio.read_2d(os.path.join(folder, "S01_2.TIF"))
    A = tiffio.read_2d(os.path.join(folder, "S01_3.TIF"))
    polys = roiio.load_roi_polygons(os.path.join(folder, "roi", "S01.json"))
    return D, A, polys


def _ref_rows(folder, cfg: Nesprin2Config):
    """Reference algorithm in numpy/scipy (same calls the reference makes)."""
    D, A, polys = _load(folder)
    H, W = D.shape
    if cfg.sat_filter_on:
        sat = (D >= cfg.sat_threshold) | (A >= cfg.sat_threshold)
        D = D.copy(); A = A.copy()
        D[sat] = np.nan
        A[sat] = np.nan

    union = np.zeros((H, W), bool)
    masks = []
    for P in polys:
        m = _rasterize(P, (H, W))
        masks.append(m)
        union |= m
    scope = None if cfg.bg_scope == "full" else union

    def bgc(img, p):
        vals = img.ravel() if scope is None else img[scope]
        vals = vals[np.isfinite(vals)]
        B = float(np.percentile(vals, p))
        J = img - B
        J[J < 0] = 0.0
        return J

    Dbc = bgc(D, cfg.percentile)
    Abc = bgc(A, cfg.percentile)
    if cfg.use_spectral:
        Dcorr, Acorr = Dbc, (Abc - cfg.alpha * Dbc) * cfg.g_factor
    else:
        Dcorr, Acorr = Dbc, Abc

    flip = cfg.ratio_mode != "FRET/Donor"
    numer, denom = (Dcorr, Acorr) if flip else (Acorr, Dcorr)
    dv = denom[union]
    dv = dv[np.isfinite(dv)]
    eps = max(5.0, float(np.percentile(dv, cfg.eps_percentile)))
    R = (numer + eps) / (denom + eps)
    if cfg.clip_ratio_on:
        R = np.where(R > cfg.clip_ratio_max, np.nan, R)

    dist = ndi.distance_transform_edt(union)
    rim = (dist > 0) & (dist <= cfg.rim_px)

    rows = []
    for i, m in enumerate(masks, 1):
        roi_mask = m & rim
        R_roi = R
        if cfg.annulus_on:
            inner, outer = cfg.ann_in_px, cfg.ann_out_px
            base = _rasterize(polys[i - 1], (H, W))
            ann = ndi.binary_dilation(base, np.ones((2 * outer + 1,) * 2)) & \
                ~ndi.binary_dilation(base, np.ones((2 * inner + 1,) * 2))
            bg_n = np.nanmedian(numer[ann]) if np.isfinite(numer[ann]).any() else 0.0
            bg_d = np.nanmedian(denom[ann]) if np.isfinite(denom[ann]).any() else 0.0
            nc = np.maximum(numer - bg_n, 0.0)
            dc = np.maximum(denom - bg_d, 0.0)
            R_roi = (nc + eps) / (dc + eps)
            if cfg.clip_ratio_on:
                R_roi = np.where(R_roi > cfg.clip_ratio_max, np.nan, R_roi)
        vals = R_roi[roi_mask]
        vals = vals[np.isfinite(vals)]
        rows.append({
            "roi": i,
            "area_px": int(roi_mask.sum()),
            "ratio_mean": float(np.mean(vals)) if vals.size else np.nan,
            "ratio_median": float(np.median(vals)) if vals.size else np.nan,
            "ratio_p95": float(np.percentile(vals, 95)) if vals.size else np.nan,
            "donor_mean": float(np.nanmean(Dcorr[roi_mask])) if roi_mask.any() else np.nan,
            "eps": eps,
        })
    return rows


def _compare(rows, ref_rows, keys=("roi", "area_px", "ratio_mean",
                                   "ratio_median", "ratio_p95", "donor_mean",
                                   "eps")):
    assert len(rows) == len(ref_rows)
    for ours, ref in zip(rows, ref_rows):
        for k in keys:
            v, o = ref[k], ours[k]
            if isinstance(v, float):
                if np.isnan(v):
                    assert np.isnan(o), (k, o, v)
                else:
                    assert abs(o - v) / max(abs(v), 1e-12) <= 1e-4, (k, o, v)
            else:
                assert o == v, (k, o, v)


@pytest.fixture(scope="module")
def folder(golden_intensity_dir):
    return os.path.join(golden_intensity_dir, "e1_P0")


def test_nesprin2_basic_rim(folder, tmp_path):
    cfg = Nesprin2Config(donor_ch=2, fret_ch=3, px_um=0.223, rim_um=1.0,
                         do_xls=True, do_tif=True, do_png=False)
    rows = run_nesprin2(folder, cfg, out_root=str(tmp_path), log=lambda *_: None)
    _compare(rows, _ref_rows(folder, cfg))
    assert (tmp_path / "xls" / "nesprin2_fret_perROI.csv").exists()
    assert (tmp_path / "xls" / "nesprin2_fret_perROI.xlsx").exists()
    assert (tmp_path / "TIF" / "ratio32_full" / "S01_ratio_full_FoverD.tif").exists()
    assert (tmp_path / "TIF" / "ratio32_rim" / "S01_ratio_rim_FoverD.tif").exists()


def test_nesprin2_qc_and_annulus(folder, tmp_path):
    cfg = Nesprin2Config(
        donor_ch=2, fret_ch=3, px_um=0.223, rim_um=0.9,
        sat_filter_on=True, sat_threshold=3000.0,
        clip_ratio_on=True, clip_ratio_max=5.0,
        annulus_on=True, ann_in_um=0.9, ann_out_um=1.8,
        do_xls=False,
    )
    rows = run_nesprin2(folder, cfg, out_root=str(tmp_path), log=lambda *_: None)
    _compare(rows, _ref_rows(folder, cfg))


def test_nesprin2_spectral_flip(folder, tmp_path):
    cfg = Nesprin2Config(
        donor_ch=2, fret_ch=3, px_um=0.223, rim_um=1.0,
        use_spectral=True, alpha=0.12, g_factor=1.5,
        ratio_mode="Donor/FRET", do_xls=False,
    )
    rows = run_nesprin2(folder, cfg, out_root=str(tmp_path), log=lambda *_: None)
    _compare(rows, _ref_rows(folder, cfg))
    assert rows[0]["ratio_DoverF_mean"] == rows[0]["ratio_mean"]


def test_nesprin2_batched_matches_serial(folder, tmp_path):
    """The tables-only batched runner (full device chain vmapped over
    pairs, one flat fetch) reproduces the serial rows exactly — including
    with annulus local-BG on."""
    from imageprocess_tpu.pipelines.nesprin2 import run_nesprin2_batched

    for kw in ({}, {"annulus_on": True, "ann_in_um": 0.9, "ann_out_um": 1.8}):
        cfg = Nesprin2Config(donor_ch=2, fret_ch=3, px_um=0.223, rim_um=1.0,
                             do_xls=False, **kw)
        r1 = run_nesprin2(folder, cfg, out_root=str(tmp_path / "s"),
                          log=lambda *_: None)
        r2 = run_nesprin2_batched(folder, cfg, out_root=str(tmp_path / "b"),
                                  log=lambda *_: None, batch_size=2)
        assert len(r1) == len(r2) > 0
        for a, b in zip(r1, r2):
            assert a.keys() == b.keys()
            for k, v in a.items():
                if isinstance(v, float):
                    if np.isnan(v):
                        assert np.isnan(b[k]), (k, kw)
                    else:
                        assert b[k] == pytest.approx(v, rel=1e-6), (k, kw)
                else:
                    assert b[k] == v, (k, kw)


def test_nesprin2_batched_sharded(folder, tmp_path):
    """Sharded over the test mesh == serial rows (DP over pairs)."""
    import jax

    from imageprocess_tpu.parallel.runner import make_mesh
    from imageprocess_tpu.pipelines.nesprin2 import run_nesprin2_batched

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = Nesprin2Config(donor_ch=2, fret_ch=3, px_um=0.223, rim_um=1.0,
                         do_xls=False)
    r1 = run_nesprin2(folder, cfg, out_root=str(tmp_path / "s"),
                      log=lambda *_: None)
    r2 = run_nesprin2_batched(folder, cfg, out_root=str(tmp_path / "b"),
                              log=lambda *_: None, batch_size=2,
                              mesh=make_mesh(2))
    assert len(r1) == len(r2) > 0
    for a, b in zip(r1, r2):
        for k, v in a.items():
            if isinstance(v, float) and not np.isnan(v):
                assert b[k] == pytest.approx(v, rel=1e-6), k
