"""Oracle tests for the device morphology kernels.

Oracles: scipy.ndimage (label 4-conn, dilation, EDT, fill_holes), cv2
(8-connected components), and hand-built semantics for the skimage calls the
reference makes (skimage itself is not installed in this environment)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from imageprocess_tpu.morphology import (
    annulus_mask,
    binary_closing_skimage,
    binary_dilation,
    binary_erosion,
    clamped_sq_edt,
    disk,
    fill_holes,
    find_contours,
    label,
    largest_component,
    region_props,
    remove_small_objects,
    rim_mask,
    square_dilation,
)
from imageprocess_tpu.morphology.ccl import label_roots


def _random_blobs(shape=(64, 96), p=0.35, seed=0, smooth=1):
    rng = np.random.default_rng(seed)
    img = rng.random(shape)
    img = ndi.gaussian_filter(img, smooth)
    return img > np.quantile(img, 1 - p)


# --- binary morphology -------------------------------------------------------

def test_disk_matches_l2_ball():
    d = disk(3)
    y, x = np.mgrid[-3:4, -3:4]
    assert np.array_equal(d, x * x + y * y <= 9)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("r", [1, 2, 3])
def test_dilation_erosion_vs_scipy(seed, r):
    fg = _random_blobs(seed=seed)
    se = disk(r)
    assert np.array_equal(
        np.asarray(binary_dilation(fg, se)), ndi.binary_dilation(fg, se)
    )
    assert np.array_equal(
        np.asarray(binary_erosion(fg, se, border_true=False)),
        ndi.binary_erosion(fg, se, border_value=0),
    )
    assert np.array_equal(
        np.asarray(binary_erosion(fg, se, border_true=True)),
        ndi.binary_erosion(fg, se, border_value=1),
    )


@pytest.mark.parametrize("r", [1, 2])
def test_closing_skimage_semantics(r):
    """skimage.binary_closing == dilate(border 0) then erode(border 1)."""
    fg = _random_blobs(seed=3)
    se = disk(r)
    expect = ndi.binary_erosion(ndi.binary_dilation(fg, se), se, border_value=1)
    assert np.array_equal(np.asarray(binary_closing_skimage(fg, se)), expect)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_square_dilation_vs_scipy(k):
    fg = _random_blobs(seed=4, p=0.1)
    expect = ndi.binary_dilation(fg, np.ones((2 * k + 1, 2 * k + 1), bool))
    assert np.array_equal(np.asarray(square_dilation(fg, k)), expect)


def test_annulus_mask_reference_semantics():
    """Nesprin2_FRET_Builder.py:416-427 with its parameter clamping."""
    base = np.zeros((40, 40), bool)
    base[15:25, 15:25] = True
    for inner, outer in [(2, 5), (0, 3), (4, 2)]:
        inner_c = max(1, inner)
        outer_c = outer if outer > inner_c else inner_c + 1
        expect = ndi.binary_dilation(
            base, np.ones((2 * outer_c + 1,) * 2)
        ) & ~ndi.binary_dilation(base, np.ones((2 * inner_c + 1,) * 2))
        assert np.array_equal(np.asarray(annulus_mask(base, inner, outer)), expect)


# --- connected components ----------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 5])
def test_label_4conn_matches_ndi(seed):
    fg = _random_blobs(seed=seed, p=0.3, smooth=0)
    ours = np.asarray(label(fg, connectivity=1, max_labels=2048))
    ref, n = ndi.label(fg)
    assert ours.max() == n
    assert np.array_equal(ours, ref)  # numbering = raster order of 1st pixel


@pytest.mark.parametrize("seed", [0, 2])
def test_label_8conn_partition_matches_cv2(seed):
    import cv2

    fg = _random_blobs(seed=seed, p=0.3, smooth=0)
    ours = np.asarray(label(fg, connectivity=2, max_labels=2048))
    n_ref, ref = cv2.connectedComponents(fg.astype(np.uint8), connectivity=8)
    assert ours.max() == n_ref - 1
    # same partition: bijective mapping between label sets
    pairs = {(int(a), int(b)) for a, b in zip(ours.ravel(), ref.ravel())}
    assert len(pairs) == n_ref  # one ref label per our label (incl. bg)


def test_label_overflow_flag():
    """with_overflow detects component counts beyond max_labels (labels
    themselves stay exact since the cumsum-rank compaction, but callers
    size per-label buffers by max_labels) — the single-device counterpart
    of sharded_label's ValueError."""
    fg = np.zeros((16, 33), bool)
    fg[::2, ::2] = True  # 8 * 17 = 136 isolated pixels (4-conn components)
    lab, over = label(fg, connectivity=1, max_labels=8, with_overflow=True)
    assert bool(over)
    lab, over = label(fg, connectivity=1, max_labels=136,
                      with_overflow=True)
    assert not bool(over)
    assert int(np.asarray(lab).max()) == 136
    # degenerate frames must not false-positive
    for frame in (np.zeros((8, 8), bool), np.ones((8, 8), bool)):
        _, over = label(frame, connectivity=1, max_labels=4,
                        with_overflow=True)
        assert not bool(over)


def test_masks_to_polygons_keeps_every_blob_of_a_label():
    """The reference appends EVERY external contour with area >= 20 and
    >= 3 vertices (ROI_auto_drawer.py:303-309) — a label owning two
    disjoint blobs must yield two polygons, not just the largest."""
    from imageprocess_tpu.morphology.contours import masks_to_polygons

    labels = np.zeros((64, 64), np.int32)
    labels[4:19, 4:19] = 1       # 225 px blob
    labels[30:50, 30:50] = 1     # 400 px blob, same label
    labels[55:57, 55:57] = 1     # 4 px blob: under min_area, dropped
    polys = masks_to_polygons(labels, min_area=20.0)
    assert len(polys) == 2
    assert all(p.shape[0] >= 3 for p in polys)


def test_label_snake():
    """Long snaky component exercises pointer jumping."""
    fg = np.zeros((32, 64), bool)
    fg[0, :] = True
    for i in range(1, 31, 2):
        fg[i, -1 if (i // 2) % 2 == 0 else 0] = True
        fg[i + 1, :] = True
    ours = np.asarray(label(fg, connectivity=1, max_labels=8))
    ref, n = ndi.label(fg)
    assert np.array_equal(ours, ref) and n == 1


def test_label_run_scan_stress():
    """Shapes that stress the segmented run min-scans added to label_roots:
    a checkerboard (every run has length 1 — the scan must not leak labels
    across background), a comb (long vertical teeth off a horizontal spine
    — column scans flood whole teeth in one round), and full-frame rows."""
    # checkerboard: 4-conn = all isolated, 8-conn = one diagonal component
    fg = np.indices((17, 23)).sum(axis=0) % 2 == 0
    ref, n = ndi.label(fg)
    ours = np.asarray(label(fg, connectivity=1, max_labels=512))
    assert ours.max() == n and np.array_equal(ours, ref)
    ours8 = np.asarray(label(fg, connectivity=2, max_labels=512))
    assert ours8.max() == 1 and np.array_equal(ours8 > 0, fg)

    # comb: spine row + every 3rd column as a tooth
    fg = np.zeros((48, 60), bool)
    fg[0, :] = True
    fg[:, ::3] = True
    ours = np.asarray(label(fg, connectivity=1, max_labels=8))
    ref, n = ndi.label(fg)
    assert n == 1 and np.array_equal(ours, ref)

    # two full-width rows separated by background
    fg = np.zeros((9, 40), bool)
    fg[2, :] = True
    fg[6, :] = True
    ours = np.asarray(label(fg, connectivity=1, max_labels=8))
    ref, n = ndi.label(fg)
    assert n == 2 and np.array_equal(ours, ref)


def test_remove_small_objects():
    fg = np.zeros((30, 30), bool)
    fg[2:4, 2:4] = True          # 4 px
    fg[10:15, 10:15] = True      # 25 px
    fg[20, 20] = True            # 1 px
    out = np.asarray(remove_small_objects(fg, min_size=5))
    expect = np.zeros_like(fg)
    expect[10:15, 10:15] = True
    assert np.array_equal(out, expect)


@pytest.mark.parametrize("seed", [0, 1])
def test_fill_holes_vs_ndi(seed):
    fg = _random_blobs(seed=seed, p=0.45, smooth=1)
    assert np.array_equal(np.asarray(fill_holes(fg)), ndi.binary_fill_holes(fg))


def test_largest_component():
    fg = np.zeros((20, 40), bool)
    fg[2:5, 2:5] = True          # 9 px
    fg[10:16, 10:16] = True      # 36 px
    mask, size = largest_component(fg)
    assert int(size) == 36
    expect = np.zeros_like(fg)
    expect[10:16, 10:16] = True
    assert np.array_equal(np.asarray(mask), expect)


# --- EDT / rim ---------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("rim_px", [1, 3, 6])
def test_rim_mask_vs_scipy_edt(seed, rim_px):
    union = _random_blobs(seed=seed, p=0.4, smooth=2)
    dist = ndi.distance_transform_edt(union)
    expect = (dist > 0) & (dist <= rim_px)
    assert np.array_equal(np.asarray(rim_mask(union, rim_px)), expect)


def test_clamped_sq_edt_exact_within_radius():
    union = _random_blobs(seed=3, p=0.5, smooth=2)
    r = 5
    sq = np.asarray(clamped_sq_edt(union, r))
    ref = ndi.distance_transform_edt(union) ** 2
    sel = ref <= r * r
    assert np.allclose(sq[sel], ref[sel], atol=1e-3)
    assert (sq[~sel] > r * r).all()


# --- region props ------------------------------------------------------------

def test_region_props_vs_numpy():
    fg = _random_blobs(seed=7, p=0.3, smooth=0)
    lab = np.asarray(label(fg, connectivity=2, max_labels=2048))
    img = np.random.default_rng(0).random(fg.shape).astype(np.float32)
    props = {k: np.asarray(v) for k, v in
             region_props(lab, img, max_labels=2048).items()}
    n = int(props["n_labels"])
    assert n == lab.max()
    for l in range(1, min(n, 20) + 1):
        m = lab == l
        i = l - 1
        assert props["area"][i] == m.sum()
        assert np.isclose(props["mean"][i], img[m].mean(), rtol=1e-5)
        rr, cc = np.nonzero(m)
        assert np.isclose(props["centroid_r"][i], rr.mean(), rtol=1e-5)
        assert props["min_r"][i] == rr.min() and props["max_r"][i] == rr.max()
        assert props["min_c"][i] == cc.min() and props["max_c"][i] == cc.max()


# --- contours ----------------------------------------------------------------

def test_find_contours_closed_blob():
    fg = np.zeros((40, 40), float)
    fg[10:30, 8:32] = 1.0
    cs = find_contours(fg, 0.5)
    assert len(cs) == 1
    c = cs[0]
    assert np.allclose(c[0], c[-1])  # closed
    # 0.5-contour of a solid 20 x 24-pixel rectangle spans rows 9.5..29.5 and
    # cols 7.5..31.5 with the 4 corners chamfered by 0.5*0.5/2 triangles
    rows = c[:, 0]
    cols = c[:, 1]
    area = 0.5 * abs(np.dot(rows, np.roll(cols, -1)) - np.dot(cols, np.roll(rows, -1)))
    assert area == 20 * 24 - 4 * 0.125


def test_find_contours_hole():
    fg = np.zeros((30, 30), float)
    fg[5:25, 5:25] = 1.0
    fg[12:18, 12:18] = 0.0
    cs = find_contours(fg, 0.5)
    assert len(cs) == 2
    for c in cs:
        assert np.allclose(c[0], c[-1])


def test_find_contours_open_at_edge():
    fg = np.zeros((20, 20), float)
    fg[0:10, 0:10] = 1.0  # touches two edges -> open contour
    cs = find_contours(fg, 0.5)
    assert len(cs) == 1
    assert not np.allclose(cs[0][0], cs[0][-1])


# --- _dilate run-decomposition edge cases ------------------------------------
# r5 rewrote arbitrary-footprint dilation from a single lax.conv into shifted
# horizontal-run reduce-window maxima (binary.py::_dilate).  Disk callers only
# ever exercise one run per SE row; these pin the general cases.


@pytest.mark.parametrize("seed", [0, 1])
def test_dilation_ring_se_vs_scipy(seed):
    """Ring footprint: TWO separate True runs on middle rows."""
    fg = _random_blobs(seed=seed)
    y, x = np.mgrid[-4:5, -4:5]
    r2 = x * x + y * y
    se = (r2 <= 16) & (r2 > 4)  # 9x9 ring: two True runs on middle rows
    assert np.array_equal(
        np.asarray(binary_dilation(fg, se)), ndi.binary_dilation(fg, se)
    )


def test_dilation_sparse_rows_and_lines_vs_scipy():
    fg = _random_blobs(seed=3)
    plus = np.zeros((5, 5), bool)
    plus[2, :] = True
    plus[:, 2] = True  # plus: full-row run + four 1-px runs
    row = np.ones((1, 7), bool)      # single-row SE (no vertical shift)
    col = np.ones((7, 1), bool)      # single-column SE (1-px runs only)
    empty_mid = np.ones((5, 3), bool)
    empty_mid[1] = empty_mid[3] = False  # all-False SE rows must be skipped
    for se in (plus, row, col, empty_mid):
        assert np.array_equal(
            np.asarray(binary_dilation(fg, se)), ndi.binary_dilation(fg, se)
        ), se
    # footprint taller than the image: vertical shifts clamp at H
    tiny = np.zeros((3, 8), bool)
    tiny[1, 2] = True
    tall = np.ones((9, 3), bool)
    assert np.array_equal(
        np.asarray(binary_dilation(tiny, tall)), ndi.binary_dilation(tiny, tall)
    )


def test_dilation_asymmetric_se_keeps_correlation_convention():
    """Asymmetric SEs keep the repo's historical (un-flipped, conv-SAME)
    offset convention — pinned against the erosion-duality oracle
    out = ~erode(~img, se) under the same _conv_count kernel."""
    rng = np.random.default_rng(7)
    fg = rng.random((40, 50)) > 0.6
    se = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 0]], bool)
    got = np.asarray(binary_dilation(fg, se))
    from imageprocess_tpu.morphology.binary import _conv_count
    import jax.numpy as jnp
    expect = np.asarray(
        _conv_count(jnp.asarray(fg, jnp.float32), jnp.asarray(se)) > 0.5
    )
    assert np.array_equal(got, expect)


def test_masks_to_polygons_bbox_crop_exact_vs_naive():
    """The r5 bbox-cropped fast path must return EXACTLY the naive
    per-label full-frame cv2 result (same polys, same order) — including
    frame-border labels, disjoint same-label blobs, and label-id gaps."""
    import cv2

    from imageprocess_tpu.morphology.contours import masks_to_polygons

    rng = np.random.default_rng(11)
    labels = np.zeros((90, 120), np.uint16)
    labels[0:18, 0:25] = 1           # touches two frame borders
    labels[40:60, 30:55] = 3         # id gap: 2 unused
    labels[40:48, 100:120] = 3       # disjoint blob of the SAME label
    labels[70:90, 60:90] = 4         # bottom border
    blob = rng.random((12, 14)) > 0.35
    labels[20:32, 70:84][blob] = 5   # ragged interior blob
    labels[88:90, 0:3] = 6           # tiny: below min_area both ways

    def naive(lab_img, min_area):
        polys = []
        for lab in range(1, int(lab_img.max()) + 1):
            m = (lab_img == lab).astype(np.uint8)
            if m.sum() == 0:
                continue
            cnts, _ = cv2.findContours(
                m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            for c in cnts:
                if cv2.contourArea(c) < float(min_area):
                    continue
                p = c[:, 0, :].astype(float)
                if p.shape[0] >= 3:
                    polys.append(p)
        return polys

    for min_area in (20.0, 0.0):
        got = masks_to_polygons(labels, min_area)
        want = naive(labels, min_area)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert np.array_equal(g, w)
