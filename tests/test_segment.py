"""Segmentation tests: in-polygon drawer core vs a numpy/scipy oracle,
full-frame auto drawer, bundle persistence, view ops."""

import os

import numpy as np
import pytest
import scipy.ndimage as ndi

from imageprocess_tpu.core import roiio, tiffio
from imageprocess_tpu.geom.rasterize import rasterize_polygon_np
from imageprocess_tpu.segment import (
    AutoSegConfig, auto_segment_frame, run_auto_drawer, segment_inside_polygon,
)
from imageprocess_tpu.segment.drawer import (
    RefineConfig, refine_and_save, save_drawer_bundle,
)


def _blob_image(seed=0, shape=(200, 260)):
    rng = np.random.default_rng(seed)
    H, W = shape
    img = rng.normal(100, 10, shape).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    img += 1000.0 * np.exp(-((yy - 90) ** 2 + (xx - 120) ** 2) / (2 * 25 ** 2))
    img += 800.0 * np.exp(-((yy - 60) ** 2 + (xx - 200) ** 2) / (2 * 12 ** 2))
    return img


def _ref_segment(img, poly, thr_param, mode):
    """roi_manual_drawer.py:337-418 with numpy/scipy; mask returned in
    full-frame coordinates."""
    from matplotlib.path import Path as MplPath

    H, W = img.shape
    p = np.asarray(poly, float)
    min_x = max(0, int(np.floor(p[:, 0].min())))
    max_x = min(W, int(np.ceil(p[:, 0].max())))
    min_y = max(0, int(np.floor(p[:, 1].min())))
    max_y = min(H, int(np.ceil(p[:, 1].max())))
    sub = img[min_y:max_y, min_x:max_x]
    sh, sw = sub.shape
    yy, xx = np.mgrid[0:sh, 0:sw]
    pts = np.vstack((xx.ravel(), yy.ravel())).T
    inside = MplPath(p - [min_x, min_y]).contains_points(pts).reshape(sh, sw)
    vals = sub[inside]
    if mode == "bnd":
        m, s = float(np.nanmean(vals)), float(np.nanstd(vals))
        thr = float(np.percentile(vals, 90.0)) if s <= 0 else m + thr_param * s
    else:
        thr = float(np.percentile(vals, thr_param))
    cand = (sub >= thr) & inside
    lab, n = ndi.label(cand)
    if n == 0:
        return thr, None
    sizes = ndi.sum(cand, lab, index=np.arange(1, n + 1))
    mask = ndi.binary_fill_holes(lab == (int(np.argmax(sizes)) + 1))
    full = np.zeros((H, W), bool)
    full[min_y:max_y, min_x:max_x] = mask
    return thr, full


@pytest.mark.parametrize("mode,param", [("percentile", 90.0),
                                        ("percentile", 75.0), ("bnd", 2.0)])
def test_segment_inside_polygon_threshold_and_mask(mode, param):
    img = _blob_image()
    poly = np.array([[70, 40], [180, 45], [175, 140], [65, 135]], float)
    thr, _, best = segment_inside_polygon(img, poly, thr_param=param,
                                          min_area=20, tolerance=0.5, mode=mode)
    ref_thr, ref_mask = _ref_segment(img, poly, param, mode)
    assert abs(thr - ref_thr) / max(abs(ref_thr), 1e-9) < 1e-4
    assert best is not None and len(best) >= 3
    # the simplified contour encloses approximately the oracle component
    mask_from_poly = rasterize_polygon_np(best, img.shape)
    inter = (mask_from_poly & ref_mask).sum()
    union = (mask_from_poly | ref_mask).sum()
    assert inter / union > 0.85  # IoU, DP-simplification tolerance


def test_segment_inside_polygon_degenerate():
    img = _blob_image()
    poly = np.array([[500, 500], [510, 500], [505, 510]], float)  # outside
    thr, _, best = segment_inside_polygon(img, poly)
    assert thr is None and best is None


def test_auto_segment_frame_finds_blobs():
    img = _blob_image()
    cfg = AutoSegConfig(thr_mode="mean_std", thr_k=3.0, smooth_sigma=1.5,
                        open_radius=1, close_radius=1, min_size_px=50)
    polys = auto_segment_frame(img, cfg)
    assert 1 <= len(polys) <= 3
    for p in polys:
        assert p.shape[1] == 2 and len(p) >= 3


def test_run_auto_drawer_writes_json(tmp_path):
    img = _blob_image()
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"),
                        np.clip(img, 0, 65535).astype(np.uint16))
    cfg = AutoSegConfig(thr_mode="mean_std", thr_k=3.0, min_size_px=50,
                        channel=1)
    written = run_auto_drawer(str(tmp_path), cfg, log=lambda *_: None)
    assert len(written) == 1
    bundle = roiio.load_roi_bundle(written[0])
    assert bundle["generated_by"] == "imageprocess_tpu.auto_threshold"
    assert bundle["image_shape"] == {"height": 200, "width": 260}
    assert len(bundle["rois"]) >= 1


def test_save_drawer_bundle_outputs(tmp_path):
    img = _blob_image()
    rois = [np.array([[70, 40], [180, 45], [175, 140], [65, 135]], float)]
    roi_dir = str(tmp_path / "roi")
    jp, mp, pp, zp = save_drawer_bundle(roi_dir, "S01", rois, img,
                                        log=lambda *_: None)
    assert all(os.path.exists(p) for p in (jp, mp, pp, zp))
    mask = np.array(__import__("PIL.Image", fromlist=["Image"]).open(mp))
    assert mask.dtype == np.uint8 and set(np.unique(mask)) <= {0, 255}
    loaded = roiio.load_imagej_roi_zip(zp)
    assert len(loaded) == 1
    assert np.allclose(loaded[0], np.round(rois[0]))


def test_refine_and_save_roundtrip(tmp_path):
    img = _blob_image()
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"),
                        np.clip(img, 0, 65535).astype(np.uint16))
    roi_dir = tmp_path / "roi"
    roi_dir.mkdir()
    rough = [np.array([[70, 40], [180, 45], [175, 140], [65, 135]], float)]
    roiio.save_roi_bundle(str(roi_dir / "S01.json"), "S01", img.shape, rough)
    cfg = RefineConfig(thr_param=90.0, min_area=20)
    written = refine_and_save(str(tmp_path), cfg, log=lambda *_: None)
    assert written
    refined = roiio.load_roi_polygons(str(roi_dir / "S01.json"))
    assert len(refined) == 1
    # refined polygon hugs the bright blob, smaller than the rough box
    from imageprocess_tpu.geom.polygon import shoelace_area
    assert shoelace_area(refined[0]) < shoelace_area(rough[0])
    assert (roi_dir / "mask" / "S01_mask.tif").exists()
    assert (roi_dir / "overlay" / "S01_overlay.png").exists()
    assert (roi_dir / "zip" / "S01.zip").exists()


def test_segment_elongated_roi_on_wide_frame():
    """An ROI whose bbox is wider than the frame's SHORT side must still be
    segmented over its full extent (regression: the square tile was clamped
    to min(H, W), silently truncating the crop; the reference slices the
    true rectangular bbox)."""
    import numpy as np

    from imageprocess_tpu.segment.autoseg import segment_inside_polygon

    H, W = 128, 700
    rng = np.random.default_rng(5)
    img = rng.normal(100, 5, (H, W)).astype(np.float32)
    # bright bar spanning x in [40, 600] — wider than H=128
    img[50:80, 40:600] += 3000.0
    rough = np.array([[20, 30], [640, 30], [640, 100], [20, 100]], float)
    # p50: the bar fills ~39% of the rough polygon, so the median threshold
    # separates bar from background (p90 would land inside the bar's own
    # noise and fragment it)
    thr, _, best = segment_inside_polygon(img, rough, thr_param=50.0,
                                          min_area=100.0)
    assert best is not None
    xs = best[:, 0]
    # the recovered polygon must span (nearly) the full bar, not stop at a
    # 128-wide truncated window
    assert xs.min() < 60 and xs.max() > 580, (xs.min(), xs.max())


@pytest.mark.filterwarnings("ignore:Corrupt EXIF data")
def test_run_auto_drawer_stageless_isolation_and_empty(tmp_path):
    """Batch-loop parity with ROI_auto_drawer.py:217-264: stage-less
    filenames fall back to the bare name and still segment; a corrupt TIFF
    or a blank frame logs and continues (no abort); a 0-cell frame writes
    NO json (file presence means "annotated" downstream)."""
    img = _blob_image()
    tiffio.write_tiff16(str(tmp_path / "cells.TIF"),
                        np.clip(img, 0, 65535).astype(np.uint16))
    (tmp_path / "broken.TIF").write_bytes(b"II*\x00garbage")
    tiffio.write_tiff16(str(tmp_path / "blank.TIF"),
                        np.zeros((64, 64), np.uint16))
    rng = np.random.default_rng(1)
    noise = rng.normal(100, 5, (64, 64))  # no blob -> 0 polygons
    tiffio.write_tiff16(str(tmp_path / "noise.TIF"),
                        np.clip(noise, 0, 65535).astype(np.uint16))
    logs = []
    cfg = AutoSegConfig(thr_mode="mean_std", thr_k=3.0, min_size_px=50)
    written = run_auto_drawer(str(tmp_path), cfg, log=logs.append)
    assert [os.path.basename(p) for p in written] == ["cells.json"]
    roi_dir = tmp_path / "roi"
    assert (roi_dir / "cells.json").exists()
    assert not (roi_dir / "noise.json").exists()
    assert not (roi_dir / "broken.json").exists()
    joined = "\n".join(logs)
    assert "broken.TIF" in joined and "blank.TIF" in joined


def test_save_drawer_bundle_artifact_isolation(tmp_path, monkeypatch):
    """One failed artifact logs a warning and the rest still save
    (roi_manual_drawer.py:1331-1371 wraps mask/overlay/zip separately)."""
    img = _blob_image()
    rois = [np.array([[70, 40], [180, 45], [175, 140], [65, 135]], float)]

    def boom(*a, **k):
        raise RuntimeError("zip exploded")

    monkeypatch.setattr(roiio, "save_imagej_roi_zip", boom)
    logs = []
    jp, mp, pp, zp = save_drawer_bundle(str(tmp_path / "roi"), "S01", rois,
                                        img, log=logs.append)
    assert os.path.exists(jp) and os.path.exists(mp) and os.path.exists(pp)
    assert zp is None  # failed artifacts return None, not a missing path
    assert any("zip" in s.lower() and "exploded" in s for s in logs)


def test_segment_frame_unet_small_tile_covers_interior():
    """tile <= 2*overlap (a checkpoint trained at tile=64 with the default
    overlap=32) must clamp the overlap, not crash with a zero range step or
    silently cover only corner tiles."""
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    H, W = 150, 150
    img = np.full((H, W), 100.0, np.float32)
    img[60:90, 60:90] = 4000.0  # interior blob, outside any corner tile

    def apply_fn(params, tiles):
        return (tiles - 0.5) * 20.0  # logits: >0 exactly on the blob

    polys = segment_frame_unet(img, apply_fn, {}, tile=64,
                               min_size_px=50, flow_follow=False)
    assert len(polys) == 1
    xs, ys = polys[0][:, 0], polys[0][:, 1]
    assert 55 <= xs.min() <= 62 and 87 <= xs.max() <= 92
    assert 55 <= ys.min() <= 62 and 87 <= ys.max() <= 92


def test_segment_frame_unet_label_overflow_raises():
    """>max_labels components alias in the size-limited CCL — the U-Net
    path must surface that like the threshold backend does, not emit
    silently merged instances."""
    import pytest

    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    img = np.full((128, 128), 100.0, np.float32)
    for cy in (20, 60, 100):  # 3 separated blobs > max_labels=2
        img[cy - 8:cy + 8, 20:36] = 4000.0

    def apply_fn(params, tiles):
        return (tiles - 0.5) * 20.0

    with pytest.raises(ValueError, match="max_labels"):
        segment_frame_unet(img, apply_fn, {}, tile=128, min_size_px=20,
                           max_labels=2, flow_follow=False)


def test_run_auto_drawer_bad_checkpoint_fails_fast(tmp_path):
    """Configuration errors (bad --checkpoint path) abort the RUN with an
    actionable error, instead of being swallowed once per frame by the
    per-file isolation and ending 'successfully' with zero output."""
    import pytest

    img = _blob_image()
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"),
                        np.clip(img, 0, 65535).astype(np.uint16))
    cfg = AutoSegConfig(backend="unet",
                        checkpoint=str(tmp_path / "no_such_ckpt"))
    with pytest.raises(Exception) as e:
        run_auto_drawer(str(tmp_path), cfg, log=lambda *_: None)
    assert "no_such_ckpt" in str(e.value)


def test_segment_frame_unet_u16_upload_dtype_invariant():
    """u16-valued frames ride the compact u16 upload (cast to f32 on
    device); the polygons must be identical whether the caller hands the
    frame as uint16 or as u16-valued float32, and float frames with
    fractional values (no u16 round trip) must keep working via the
    device-sort stretch path."""
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    rng = np.random.default_rng(3)
    base = (rng.random((150, 150)) * 200).astype(np.uint16)
    base[60:90, 60:90] = 4000

    def apply_fn(params, tiles):
        return (tiles - 0.5) * 20.0

    kw = dict(tile=64, min_size_px=50, flow_follow=False)
    p_u16 = segment_frame_unet(base, apply_fn, {}, **kw)
    p_f32 = segment_frame_unet(base.astype(np.float32), apply_fn, {}, **kw)
    assert len(p_u16) == len(p_f32) == 1
    assert np.array_equal(p_u16[0], p_f32[0])

    frac = base.astype(np.float32) + 0.25  # defeats the u16 round trip
    p_frac = segment_frame_unet(frac, apply_fn, {}, **kw)
    assert len(p_frac) == 1
