"""MOR_by_ROI pipeline parity vs an in-test numpy replication of the
reference metrics (src/MOR_by_ROI.py:166-241) on the golden ROI set."""

import math
import os

import numpy as np
import pytest
from matplotlib.path import Path as MplPath

from imageprocess_tpu.core import roiio
from imageprocess_tpu.pipelines.morphology import (
    MorConfig, morphology_rows, run_morphology,
)


def _rasterize(poly, shape):
    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    return MplPath(np.asarray(poly, float)).contains_points(pts).reshape(H, W)


def _ref_metrics(poly, shape, px_um):
    mask = _rasterize(poly, shape)
    area_px = float(mask.sum())
    P = np.asarray(poly, float)
    dif = P[(np.arange(len(P)) + 1) % len(P)] - P
    perimeter_px = float(np.sqrt((dif ** 2).sum(axis=1)).sum())
    ys, xs = np.nonzero(mask)
    cov = np.cov(np.vstack([xs - xs.mean(), ys - ys.mean()]))
    w, v = np.linalg.eigh(cov)
    angle = math.degrees(math.atan2(v[1, 1], v[0, 1]))
    major = 4.0 * math.sqrt(max(w[1], 0.0)) * px_um
    minor = 4.0 * math.sqrt(max(w[0], 0.0)) * px_um
    return {
        "area_px": area_px,
        "perimeter_px": perimeter_px,
        "major_um": major,
        "minor_um": minor,
        "orientation_deg": angle,
        "centroid_x": float(xs.mean()),
        "centroid_y": float(ys.mean()),
        "circularity": 4.0 * math.pi * area_px / perimeter_px ** 2,
        "aspect_ratio": major / minor,
    }


def test_morphology_rows_match_reference(golden_intensity_dir):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    polys = roiio.load_roi_polygons(os.path.join(folder, "roi", "S01.json"))
    shape = (1536, 2048)
    rows = morphology_rows(polys, shape, px_um=0.223)
    assert len(rows) == 18
    for poly, row in zip(polys, rows):
        ref = _ref_metrics(poly, shape, 0.223)
        for k, v in ref.items():
            assert abs(row[k] - v) / max(abs(v), 1e-9) <= 1e-4, (k, row[k], v)
        # solidity mixes pixel area (numerator) with polygon hull area
        # (denominator) and can legitimately exceed 1 — reference quirk
        # preserved (MOR_by_ROI.py:222-234, SURVEY §2.2)
        assert 0 < row["solidity"] < 1.1
        assert row["roundness"] > 0


def test_run_morphology_end_to_end(golden_intensity_dir, tmp_path):
    folder = os.path.join(golden_intensity_dir, "e1_P0")
    cfg = MorConfig(px_um=0.223, sel_ch=2, save_full=True, save_crop=False)
    rows = run_morphology(folder, cfg, out_root=str(tmp_path),
                          log=lambda *_: None)
    assert len(rows) == 18
    assert rows[0]["stage"] == "S01" and rows[0]["channel"] == 2
    assert (tmp_path / "xls" / "morphology_perROI.csv").exists()
    assert (tmp_path / "xls" / "morphology_perROI.xlsx").exists()
    assert (tmp_path / "PNG" / "overlay_full" / "S01_overlay_ch2.png").exists()

    import pandas as pd
    df = pd.read_csv(tmp_path / "xls" / "morphology_perROI.csv")
    assert list(df.columns)[:6] == ["stage", "time", "roi", "img", "channel", "px_um"]
    assert len(df) == 18


def test_morphology_degenerate_polygon():
    # zero-area polygon -> area 0 row with NaN metrics (MOR_by_ROI.py:216-221)
    poly = np.array([[5.0, 5.0], [5.0, 5.0], [5.0, 5.0]])
    rows = morphology_rows([poly], (64, 64), px_um=0.2)
    assert rows[0]["area_px"] == 0
    assert np.isnan(rows[0]["circularity"])


def test_single_pixel_roi_is_graceful():
    """A polygon whose mask is ONE pixel: the reference crashes here
    (np.cov of one observation -> NaN -> the non-finite branch's 4-float
    return is unpacked as (cy, cx) -> TypeError, MOR_by_ROI.py:201-209);
    the rebuild keeps the batch running with degenerate-but-defined
    metrics (documented divergence, PARITY.md)."""
    import numpy as np

    from imageprocess_tpu.pipelines.morphology import morphology_rows

    poly = np.array([[5.7, 5.7], [6.3, 5.7], [6.0, 6.4]])
    rows = morphology_rows([poly], (16, 16), px_um=0.25)
    (r,) = rows
    assert r["area_px"] == 1.0
    assert r["major_um"] == 0.0 and r["minor_um"] == 0.0
    assert np.isnan(r["aspect_ratio"]) and np.isnan(r["roundness"])
    assert abs(r["centroid_x"] - 6.0) < 1e-6
    assert abs(r["centroid_y"] - 6.0) < 1e-6
