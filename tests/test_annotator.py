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


def test_annotator_per_index_edit(tmp_path):
    """Per-index ROI management (reference ROI manager,
    roi_manual_drawer.py:1206-1276): pick by click, delete by index,
    redraw one ROI in place without renumbering the others."""
    ann = _setup(tmp_path)
    rough = [(60, 40), (105, 40), (105, 85), (60, 85)]
    far = [(5, 5), (30, 5), (30, 30), (5, 30)]
    ann.add_rough_polygon(rough)
    ann.add_rough_polygon(far)
    assert len(ann.rois) == 2

    # pick by click: point inside the blob ROI selects index 0
    assert ann.roi_index_at(80, 60) == 0
    assert ann.roi_index_at(15, 15) == 1
    assert ann.roi_index_at(150, 110) is None

    # redraw index 0 with a different rough polygon; index 1 untouched
    before_1 = ann.rois[1].copy()
    out = ann.replace_index(0, [(55, 35), (110, 35), (110, 90), (55, 90)])
    assert out is not None and len(ann.rois) == 2
    np.testing.assert_array_equal(ann.rois[1], before_1)

    # delete by index
    ann.delete_index(0)
    assert len(ann.rois) == 1
    np.testing.assert_array_equal(ann.rois[0], before_1)


def test_annotator_accept_retry_loop(tmp_path):
    """The modal accept/retry flow (roi_manual_drawer.py:1052-1077):
    propose with one threshold, retry with another, nothing committed
    until accept."""
    ann = _setup(tmp_path)
    rough = [(60, 40), (105, 40), (105, 85), (60, 85)]
    thr1, cand1 = ann.propose_polygon(rough)
    assert cand1 is not None and ann.rois == []
    thr2, cand2 = ann.propose_polygon(rough, thr_param=70.0)
    assert cand2 is not None and ann.rois == []
    assert thr2 != thr1  # retry actually re-thresholded
    idx = ann.accept(cand2)
    assert idx == 0 and len(ann.rois) == 1


def test_annotator_resumes_existing_bundle(tmp_path):
    """Opening a task whose roi/<base>.json already exists loads the saved
    ROIs and view state (regression: the annotator started empty and
    save-on-close overwrote prior manual annotations with an empty
    bundle — permanent data loss)."""
    ann = _setup(tmp_path)
    poly = np.array([[60, 40], [105, 42], [100, 85], [58, 80]], float)
    roiio.save_roi_bundle(
        str(tmp_path / "roi" / "S01.json"), "S01", ann.image.shape, [poly],
        view_params={"gamma": 0.7, "last_channel": 2})

    ann2 = ROIAnnotator(ann.channel_map, "S01", str(tmp_path / "roi"),
                        log=lambda *_: None)
    assert len(ann2.rois) == 1
    np.testing.assert_allclose(ann2.rois[0], poly)
    assert ann2.view["gamma"] == 0.7
    assert ann2.channel == 2          # resumes the saved channel
    ann2.save()                        # close without touching anything
    back = roiio.load_roi_polygons(str(tmp_path / "roi" / "S01.json"))
    assert len(back) == 1              # nothing lost
    np.testing.assert_allclose(back[0], poly)


def test_annotator_no_empty_bundle_litter(tmp_path):
    """Opening a fresh task and closing without drawing must NOT create an
    empty roi bundle."""
    import os

    ann = _setup(tmp_path)
    ann.save()
    assert not os.path.exists(str(tmp_path / "roi" / "S01.json"))


def test_annotator_ui_selector_lifecycle(tmp_path, monkeypatch):
    """Headless (Agg) drive of the matplotlib UI path: repeated 'p' must
    not stack selectors, completing a polygon must tear the selector's
    artists off the axes (regression: the _roi_artists-only redraw left
    the finished selector's polygon overlaid forever), and _redraw must
    keep exactly one outline+label pair per ROI."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    ann = _setup(tmp_path)
    ann.show()  # builds fig/ax; show() itself is a no-op under the patch
    assert ann._fig is not None and ann._ax is not None

    class Ev:
        key = "p"
        xdata = ydata = None

    ann._on_key(Ev())
    sel = ann._selector
    assert sel is not None
    ann._on_key(Ev())             # second 'p' must NOT stack a new one
    assert ann._selector is sel

    n_lines_live = len(ann._ax.lines)
    sel.onselect([(40, 30), (130, 35), (125, 100), (35, 95)])
    assert ann._selector is None and len(ann.rois) == 1
    # the finished selector's own artists are gone or hidden; ours remain
    stale = [ln for ln in ann._ax.lines
             if ln not in ann._roi_artists and ln.get_visible()]
    assert not stale, f"stale selector artists: {stale}"
    assert len(ann._roi_artists) == 2  # one outline + one label

    # redraw after a view toggle keeps exactly one outline per ROI
    class EvI:
        key = "i"
        xdata = ydata = None

    ann._on_key(EvI())
    assert len([a for a in ann._roi_artists if a in ann._ax.lines]) == 1
    plt.close(ann._fig)


def test_annotator_key_map(tmp_path):
    """Every cursor-independent reference key (roi_manual_drawer.py:
    1095-1141, 1273-1275) drives the matching behavior through
    handle_key — the exact dispatch the UI uses."""
    ann = _setup(tmp_path)
    v = ann.view

    # percentile window a/d/s/f with the reference clamps
    assert ann.handle_key("a") and v["p_low"] == 0.0
    assert ann.handle_key("a") and v["p_low"] == 0.0          # floor clamp
    assert ann.handle_key("d") and v["p_low"] == 1.0
    assert ann.handle_key("s") and v["p_high"] == 98.0
    assert ann.handle_key("f") and v["p_high"] == 99.0
    assert ann.handle_key("f") and v["p_high"] == 100.0
    assert ann.handle_key("f") and v["p_high"] == 100.0       # ceil clamp
    v["p_high"] = 1.5
    ann.handle_key("d")
    assert np.isclose(v["p_low"], 1.4)                        # p_high-0.1 cap

    # gamma g/G, invert i, reset v
    v.update(p_low=1.0, p_high=99.0, gamma=1.0)
    assert ann.handle_key("g") and np.isclose(v["gamma"], 0.9)
    assert ann.handle_key("G") and np.isclose(v["gamma"], 1.0)
    assert ann.handle_key("i") and v["invert"] is True
    v.update(p_low=5.0, p_high=80.0, gamma=2.0)
    assert ann.handle_key("v")
    assert (v["p_low"], v["p_high"], v["gamma"], v["invert"]) == \
        (1.0, 99.0, 1.0, False)

    # pseudocolor cycling 0-5 (reference PCOLORS order)
    for key, mode in [("1", "cyan"), ("2", "blue"), ("3", "green"),
                      ("4", "red"), ("5", "yellow"), ("0", "grayscale")]:
        assert ann.handle_key(key) and v["color_mode"] == mode

    # filter pipeline toggles, each reachable and rendering
    for key, name in [("e", "use_clahe"), ("b", "use_bandpass"),
                      ("n", "use_unsharp"), ("o", "edge_overlay")]:
        assert ann.handle_key(key) and v[name] is True
    rgb = ann.rendered()   # all four filters on at once still renders
    assert rgb.shape == (120, 160, 3) and np.isfinite(rgb).all()
    for key in "ebno":
        ann.handle_key(key)

    # ROI management u/c + channel cycling tab/shift+tab
    ann.add_rough_polygon([(40, 30), (130, 35), (125, 100), (35, 95)])
    ann.add_rough_polygon([(40, 30), (130, 35), (125, 100), (35, 95)])
    assert ann.handle_key("u") and len(ann.rois) == 1
    assert ann.handle_key("c") and len(ann.rois) == 0
    assert ann.handle_key("tab") and ann.channel == 2
    assert ann.handle_key("shift+tab") and ann.channel == 1

    # unknown keys fall through untouched
    assert not ann.handle_key("w") and not ann.handle_key("")
