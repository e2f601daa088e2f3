"""Cropper pipeline parity (vs numpy replication of run_crop's
normalization) + timelapse-PPT builder round trip."""

import os

import numpy as np
import pytest
from PIL import Image

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.pipelines.crop import CropConfig, run_crop
from imageprocess_tpu.pipelines.fretppt import collect_pairs, run_fret_ppt
from imageprocess_tpu.report.pptxlite import read_pptx_summary


@pytest.fixture()
def crop_dataset(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 300, 400
    img = rng.integers(50, 4000, (H, W)).astype(np.uint16)
    tiffio.write_tiff16(str(tmp_path / "S01_2.TIF"), img)
    polys = [np.array([[60, 50], [180, 55], [170, 160], [55, 150]], float),
             np.array([[220, 180], [350, 190], [340, 280], [210, 270]], float)]
    (tmp_path / "roi").mkdir()
    roiio.save_roi_bundle(str(tmp_path / "roi" / "S01.json"), "S01", (H, W), polys)
    return tmp_path, img, polys


def test_run_crop_outputs_and_norm_parity(crop_dataset, tmp_path_factory):
    folder, img, polys = crop_dataset
    out = tmp_path_factory.mktemp("crop_out")
    cfg = CropConfig(channel=2, gamma=2.0, low_cut=1.0, high_cut=1.0,
                     mask_outside=True, save_png=True, save_tiff16=True,
                     save_tiff_raw=True, fixed_crop=False, png_dpi=60)
    written = run_crop(str(folder), str(folder / "roi"), str(out), cfg,
                       log=lambda *_: None)
    names = sorted(os.path.basename(w) for w in written)
    assert "S01_roi1_ch2.png" in names and "S01_roi2_ch2.png" in names

    # numpy replication of the normalization (roi_channel_cropper.py:904-936)
    from imageprocess_tpu.geom.rasterize import rasterize_polygon_np
    H, W = img.shape
    P = polys[0]
    pad = max(10, int(0.05 * max(W, H)))
    x0 = max(int(P[:, 0].min()) - pad, 0)
    x1 = min(int(P[:, 0].max()) + pad, W - 1)
    y0 = max(int(P[:, 1].min()) - pad, 0)
    y1 = min(int(P[:, 1].max()) + pad, H - 1)
    crop = img[y0:y1 + 1, x0:x1 + 1].astype(np.float32)
    lo = np.percentile(crop.ravel(), 1.0)
    hi = np.percentile(crop.ravel(), 99.0)
    local = rasterize_polygon_np(P - [x0, y0], crop.shape)
    norm = np.clip((crop - lo) / (hi - lo), 0, 1) * local
    ref16 = (np.clip(norm ** 0.5, 0, 1) * 65535).astype(np.uint16)

    got16 = np.array(Image.open(out / "TIFF16" / "S01_roi1_ch2.tif"))
    assert got16.shape == ref16.shape
    assert np.abs(got16.astype(int) - ref16.astype(int)).max() <= 1  # f32 rounding

    raw = np.array(Image.open(out / "TIFF" / "S01_roi1_ch2.tif"))
    ref_raw = img[y0:y1 + 1, x0:x1 + 1].copy()
    ref_raw[~local] = 0
    assert np.array_equal(raw, ref_raw)


def test_run_crop_subset_roi(crop_dataset, tmp_path_factory):
    folder, _, _ = crop_dataset
    out = tmp_path_factory.mktemp("crop_sub")
    cfg = CropConfig(channel=2, save_png=False, save_tiff16=True,
                     subset_stage=1, subset_roi=2, fixed_crop=False)
    written = run_crop(str(folder), str(folder / "roi"), str(out), cfg,
                       log=lambda *_: None)
    assert [os.path.basename(w) for w in written] == ["S01_roi2_ch2.tif"]


def test_fret_ppt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for s in ("S01", "S02"):
        for t in range(3):
            # "DoverF_rim" matches the classifier's "dov" keyword; note the
            # reference classifier does NOT match "FoverD_*" names
            # (Make_FRET_timelapsePPT.py:47-56) — quirk preserved
            for suffix in ("DoverF_rim", "BF"):
                arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    tmp_path / f"{s}_t{t:02d}_roi1_{suffix}.png")
    timeline = collect_pairs(str(tmp_path))
    assert set(timeline) == {("S01", "1"), ("S02", "1")}
    assert [t for t, _, _ in timeline[("S01", "1")]] == [0, 1, 2]

    ok, path = run_fret_ppt(str(tmp_path), img_width_cm=2.0,
                            log=lambda *_: None)
    assert ok and os.path.exists(path)
    summary = read_pptx_summary(path)
    assert len(summary["slides"]) == 2
    assert summary["slides"][0]["pictures"] == 6  # 3 timepoints x 2 rows
    assert any("S01" in t for t in summary["slides"][0]["texts"])
    assert len(summary["media"]) == 12


def test_fret_ppt_no_pairs(tmp_path):
    ok, msg = run_fret_ppt(str(tmp_path), log=lambda *_: None)
    assert not ok


def test_ppt_layout_spec():
    """Pure slide-geometry spec (Make_FRET_timelapsePPT.py:100-188
    semantics): desired width kept when the row fits, proportional shrink
    when it doesn't, None on gap overflow; FRET row above BF row."""
    from imageprocess_tpu.pipelines.fretppt import (
        DeckGeometry, cm, fit_row_width, slide_layout,
    )

    geo = DeckGeometry()
    # 3 x 2cm thumbnails fit easily inside 33.867cm - 2x1cm margins
    assert fit_row_width(3, cm(2.0), geo) == cm(2.0)
    # 20 x 2cm + 19 gaps = 41.9cm > 31.867cm available -> shrunk
    w20 = fit_row_width(20, cm(2.0), geo)
    assert w20 is not None and w20 < cm(2.0)
    row = 20 * w20 + 19 * geo.col_gap
    assert row <= geo.slide_w - 2 * geo.margin_x
    # shrink is proportional: just under the available width
    assert row > 0.99 * (geo.slide_w - 2 * geo.margin_x)
    assert fit_row_width(0, cm(2.0), geo) is None
    # pathological: so many columns the gaps alone exceed the slide
    assert fit_row_width(400, cm(2.0), geo) is None

    spec = slide_layout("S03", "2", (0, 1, 2), cm(2.0), geo)
    assert spec.img_w == cm(2.0)
    assert spec.lefts == tuple(geo.margin_x + i * (cm(2.0) + geo.col_gap)
                               for i in range(3))
    assert spec.fret_top == geo.margin_top
    assert spec.bf_top == geo.margin_top + spec.img_w + geo.row_gap
    assert "S03" in spec.caption and "ROI2" in spec.caption
    assert "t02" in spec.caption


def test_pptx_summary_slide_order(tmp_path):
    """read_pptx_summary reports slides in numeric order for decks with
    >= 10 slides (lexicographic sorting put slide10 before slide2)."""
    from imageprocess_tpu.report.pptxlite import (
        Presentation, cm, read_pptx_summary,
    )

    prs = Presentation()
    for k in range(12):
        s = prs.add_slide()
        s.add_textbox(f"slide-{k}", cm(1), cm(1), cm(5), cm(1))
    p = str(tmp_path / "order.pptx")
    prs.save(p)
    out = read_pptx_summary(p)
    assert len(out["slides"]) == 12
    for k, sl in enumerate(out["slides"]):
        assert sl["texts"] == [f"slide-{k}"], (k, sl)
