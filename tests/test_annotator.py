"""Headless tests of the interactive annotator's core actions (UI-free)."""

import numpy as np

from imageprocess_tpu.apps.draw import ROIAnnotator
from imageprocess_tpu.core import roiio, tiffio


def _setup(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 120, 160
    img = rng.normal(100, 5, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    img += 900 * np.exp(-((yy - 60) ** 2 + (xx - 80) ** 2) / (2 * 15 ** 2))
    for ch in (1, 2):
        tiffio.write_tiff16(str(tmp_path / f"S01_{ch}.TIF"),
                            np.clip(img * ch, 0, 65535).astype(np.uint16))
    chmap = {1: str(tmp_path / "S01_1.TIF"), 2: str(tmp_path / "S01_2.TIF")}
    return ROIAnnotator(chmap, "S01", str(tmp_path / "roi"),
                        log=lambda *_: None)


def test_annotator_flow(tmp_path):
    ann = _setup(tmp_path)
    assert ann.channel == 1
    assert ann.cycle_channel() == 2
    assert ann.cycle_channel() == 1

    rough = [(40, 30), (130, 35), (125, 100), (35, 95)]
    refined = ann.add_rough_polygon(rough)
    assert refined is not None and len(ann.rois) == 1

    rgb = ann.rendered()
    assert rgb.shape == (120, 160, 3) and rgb.max() <= 1.0

    ann.add_rough_polygon(rough)
    ann.delete_last()
    assert len(ann.rois) == 1

    ann.save()
    polys = roiio.load_roi_polygons(str(tmp_path / "roi" / "S01.json"))
    assert len(polys) == 1
    bundle = roiio.load_roi_bundle(str(tmp_path / "roi" / "S01.json"))
    assert bundle["view_params"]["last_channel"] == 1
    assert (tmp_path / "roi" / "mask" / "S01_mask.tif").exists()
    assert (tmp_path / "roi" / "zip" / "S01.zip").exists()


def test_annotator_degenerate_polygon(tmp_path):
    ann = _setup(tmp_path)
    assert ann.add_rough_polygon([(1, 1), (2, 2)]) is None
    assert ann.rois == []


def test_annotator_view_filters(tmp_path):
    ann = _setup(tmp_path)
    ann.view.update({"use_bandpass": True, "sigma_small": 1.0,
                     "sigma_large": 4.0, "use_unsharp": True,
                     "use_clahe": True, "edge_overlay": True})
    rgb = ann.rendered()
    assert rgb.shape == (120, 160, 3)
    assert np.isfinite(rgb).all() and rgb.min() >= 0 and rgb.max() <= 1.0
