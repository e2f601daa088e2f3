"""Interop against the reference's committed artifacts: the ImageJ ROI zip
and the saved mask TIFF must agree with the JSON polygons."""

import os
import zipfile

import numpy as np
import pytest
from PIL import Image

from imageprocess_tpu.core import roiio
from imageprocess_tpu.geom.rasterize import EdgeRule, rasterize_polygon_np

GOLD_ROI = "/root/reference/Testsamples/1Flu_Intensity(BCC P0 and P1)/ANA/e1_P0/roi"


@pytest.fixture(scope="module")
def gold():
    if not os.path.isdir(GOLD_ROI):
        pytest.skip("golden roi dir missing")
    return GOLD_ROI


def test_golden_imagej_zip_matches_json(gold):
    """The committed roifile-written S01.zip decodes to the same polygons
    (rounded ints, drawer convention) as S01.json — loaded[i] IS ROI i+1
    now that the loader sorts entries by natural key (lexicographic order
    used to scramble zips with >= 10 ROIs)."""
    polys = roiio.load_roi_polygons(os.path.join(gold, "S01.json"))
    loaded = roiio.load_imagej_roi_zip(os.path.join(gold, "zip", "S01.zip"))
    assert len(loaded) == len(polys) == 18
    for want_f, got in zip(polys, loaded):
        want = np.round(want_f)
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 1.0  # roifile rounding freedom


def test_golden_mask_tif_matches_polygons(gold):
    """roi/mask/S01_mask.tif (skimage polygon fill) == our PNPOLY rasterizer
    union of the JSON polygons."""
    mask_path = os.path.join(gold, "mask", "S01_mask.tif")
    if not os.path.exists(mask_path):
        pytest.skip("golden mask stripped")
    mask = np.array(Image.open(mask_path)) > 0
    polys = roiio.load_roi_polygons(os.path.join(gold, "S01.json"))
    ours = np.zeros(mask.shape, bool)
    for p in polys:
        ours |= rasterize_polygon_np(p, mask.shape, EdgeRule.MPL)
    # pixel-exact: the golden mask follows the matplotlib edge rule
    assert (ours ^ mask).sum() == 0


def test_golden_zip_reencode_roundtrip(gold, tmp_path):
    """Our encoder's zip re-decodes to identical polygons, in ROI order."""
    polys = roiio.load_roi_polygons(os.path.join(gold, "S01.json"))
    zp = str(tmp_path / "S01.zip")
    roiio.save_imagej_roi_zip(zp, polys, "S01")
    loaded = roiio.load_imagej_roi_zip(zp)
    assert len(loaded) == 18
    for want, got in zip(polys, loaded):
        assert np.array_equal(got, np.round(want))
