import json
import os

import numpy as np
import pytest

from imageprocess_tpu.geom import (
    EdgeRule,
    pad_polygons,
    rasterize_polygon_np,
    rasterize_polygons,
    rasterize_union,
)
from imageprocess_tpu.geom.rasterize import rasterize_polygons_np


def _mpl_mask(poly, shape):
    import matplotlib.path as mpath

    H, W = shape
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    return mpath.Path(np.asarray(poly, float)).contains_points(pts).reshape(H, W)


SQUARE = np.array([[2.0, 3.0], [10.0, 3.0], [10.0, 8.0], [2.0, 8.0]])
TRIANGLE = np.array([[1.5, 1.5], [12.5, 2.5], [5.0, 11.0]])
CONCAVE = np.array(
    [[1.0, 1.0], [11.0, 1.0], [11.0, 11.0], [6.0, 6.0], [1.0, 11.0]]
)


@pytest.mark.parametrize("poly", [SQUARE, TRIANGLE, CONCAVE])
def test_host_matches_matplotlib_synthetic(poly):
    shape = (16, 16)
    ours = rasterize_polygon_np(poly, shape, EdgeRule.MPL)
    ref = _mpl_mask(poly, shape)
    np.testing.assert_array_equal(ours, ref)


def test_device_matches_host_synthetic():
    shape = (16, 16)
    polys = [SQUARE, TRIANGLE, CONCAVE]
    dev = np.asarray(rasterize_polygons(pad_polygons(polys), shape, EdgeRule.MPL))
    host = rasterize_polygons_np(polys, shape, EdgeRule.MPL)
    np.testing.assert_array_equal(dev, host)


def test_random_polygons_match_matplotlib():
    rng = np.random.default_rng(42)
    shape = (64, 64)
    for _ in range(20):
        n = rng.integers(3, 12)
        # star-shaped (simple) polygon: sort random points by angle
        pts = rng.uniform(2, 62, size=(n, 2))
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        poly = pts[np.argsort(ang)]
        # snap to half-grid (contour-derived ROIs live on this grid)
        poly = np.round(poly * 2) / 2
        ours = rasterize_polygon_np(poly, shape, EdgeRule.MPL)
        ref = _mpl_mask(poly, shape)
        np.testing.assert_array_equal(ours, ref)


def test_pnpoly_rule_differs_only_on_boundary():
    shape = (16, 16)
    m_mpl = rasterize_polygon_np(SQUARE, shape, EdgeRule.MPL)
    m_pnp = rasterize_polygon_np(SQUARE, shape, EdgeRule.PNPOLY)
    diff = m_mpl ^ m_pnp
    # integer-coordinate square: boundary pixels differ per rule, interior equal
    assert m_mpl[4, 5] and m_pnp[4, 5]
    ys, xs = np.nonzero(diff)
    for y, x in zip(ys, xs):
        assert x in (2, 10) or y in (3, 8)  # only on the square's edges


def test_union():
    shape = (16, 16)
    polys = [SQUARE, TRIANGLE]
    union = np.asarray(rasterize_union(pad_polygons(polys), shape))
    sep = rasterize_polygons_np(polys, shape)
    np.testing.assert_array_equal(union, sep[0] | sep[1])


def test_golden_rois_exact_matplotlib_parity(golden_intensity_dir):
    """Pixel-exact parity with the reference rasterizer on all 18 golden ROIs,
    on device in float32 — this pins the golden CSV's area_px column."""
    p = os.path.join(golden_intensity_dir, "e1_P0", "roi", "S01.json")
    polys = [np.asarray(q, float) for q in json.load(open(p))["rois"]]
    shape = (1536, 2048)
    import pandas as pd

    csv = os.path.join(
        golden_intensity_dir, "e1_P0", "RES", "xls", "fluor_intensity_perROI.csv"
    )
    golden_areas = pd.read_csv(csv)["area_px"].astype(int).tolist()

    dev = np.asarray(rasterize_polygons(pad_polygons(polys), shape, EdgeRule.MPL))
    assert dev.sum(axis=(1, 2)).tolist() == golden_areas

    # spot-check full-mask equality vs matplotlib on a few ROIs
    for i in (0, 7, 11):
        np.testing.assert_array_equal(dev[i], _mpl_mask(polys[i], shape))
