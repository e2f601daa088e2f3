"""Direct-PIL borderless compositor vs the matplotlib reference path.

The borderless savers (save_png_colormap without colorbar, save_png_gray,
save_png_image) now render through report.pilcomp.  These tests pin the
contract that made the swap safe:

- at identity scale (out_px == image dims) the composed canvas is
  pixel-equal (<=1 LUT step) to what the matplotlib figure pipeline
  produced for the same RGBA array;
- letterbox geometry matches matplotlib's aspect='equal' center anchor;
- the scalebar stamp puts an opaque white bar exactly on the
  scalebar_spec geometry;
- alpha-0 (masked) pixels show the black facecolor through.
"""

import io

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from PIL import Image

from imageprocess_tpu.report import pilcomp
from imageprocess_tpu.report.render import colormap_rgba_u8, scalebar_spec


def _mpl_borderless(rgba, out_px, dpi):
    """The pre-pilcomp matplotlib path, as a reference oracle."""
    fig, ax = plt.subplots()
    ax.set_facecolor("black")
    fig.patch.set_facecolor("black")
    ax.imshow(rgba)
    ax.set_axis_off()
    ax.set_position((0.0, 0.0, 1.0, 1.0))
    if out_px:
        fig.set_size_inches(out_px[0] / dpi, out_px[1] / dpi)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=dpi, facecolor=fig.get_facecolor())
    plt.close(fig)
    buf.seek(0)
    return np.array(Image.open(buf).convert("RGB"))


def _pil_borderless(rgba, out_px, dpi):
    canvas, _ = pilcomp.compose_borderless(rgba, out_px, dpi)
    return np.array(canvas.convert("RGB"))


@pytest.mark.parametrize("cmap", ["gray", "jet"])
def test_identity_scale_pixel_parity(cmap):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 4000, size=(120, 160)).astype(np.float32)
    rgba = colormap_rgba_u8(img, cmap, 0.0, 3500.0)
    ours = _pil_borderless(rgba, (160, 120), dpi=300)
    ref = _mpl_borderless(rgba, (160, 120), dpi=300)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1, diff.max()
    assert np.mean((ours == ref).all(axis=-1)) > 0.99


def test_identity_scale_masked_pixels_show_black(tmp_path):
    img = np.full((40, 50), 100.0, np.float32)
    mask = np.ones((40, 50), bool)
    mask[5:10, 5:10] = False
    rgba = colormap_rgba_u8(img, "jet", 0.0, 200.0, mask=mask)
    ours = _pil_borderless(rgba, (50, 40), dpi=300)
    ref = _mpl_borderless(rgba, (50, 40), dpi=300)
    assert (ours[5:10, 5:10] == 0).all()
    assert np.array_equal(ours, ref)


def test_letterbox_geometry_matches_mpl():
    """A 100x50 image in a 300x300 canvas must land center-anchored at
    matplotlib's aspect-equal box (300x150 at y offset 75)."""
    rgba = np.full((50, 100, 4), 255, np.uint8)
    rgba[..., :3] = 200
    ours = _pil_borderless(rgba, (300, 300), dpi=100)
    ref = _mpl_borderless(rgba, (300, 300), dpi=100)
    # same non-black row band (letterbox offsets agree)
    ours_rows = np.where((ours > 50).any(axis=(1, 2)))[0]
    ref_rows = np.where((ref > 50).any(axis=(1, 2)))[0]
    assert abs(ours_rows.min() - ref_rows.min()) <= 1
    assert abs(ours_rows.max() - ref_rows.max()) <= 1
    ox, oy, dw, dh = pilcomp.letterbox_geometry(100, 50, 300, 300)
    assert (ox, oy, dw, dh) == (0, 75, 300, 150)


def test_scalebar_stamp_geometry():
    H, W = 200, 300
    rgba = np.zeros((H, W, 4), np.uint8)
    rgba[..., 3] = 255
    spec = scalebar_spec(W, H, scalebar_um=20.0, px_um=0.5)  # 40 px bar
    canvas, box = pilcomp.compose_borderless(rgba, (W, H), dpi=300)
    pilcomp.stamp_scalebar(canvas, box, W, H, spec, dpi=300)
    arr = np.array(canvas.convert("RGB"))
    # bar row: white run centered on spec.y spanning spec.x0..x1
    row = arr[int(spec.y)]
    white_cols = np.where((row == 255).all(axis=-1))[0]
    assert white_cols.size >= 35
    assert abs(white_cols.min() - spec.x0) <= 2
    assert abs(white_cols.max() - spec.x1) <= 2
    # label: some bright pixels above the bar (va='bottom' label)
    label_band = arr[max(0, int(spec.label_y) - 20):int(spec.label_y) + 2]
    assert (label_band > 200).any()


def test_compose_titled_layout():
    rgba = np.full((80, 200, 4), 128, np.uint8)
    rgba[..., 3] = 255
    canvas, box = pilcomp.compose_titled(rgba, 400, "S01 ROI#1 AR=1.23",
                                         font_pt=9, dpi=220)
    ox, oy, dw, dh = box
    assert canvas.size[0] == 400 and dw == 400 and dh == 160
    assert canvas.size[1] == oy + dh
    arr = np.array(canvas.convert("RGB"))
    # title strip has dark text on white
    assert (arr[:oy] < 100).any()
    # image area is the gray fill
    assert (arr[oy + 5:oy + dh - 5] == 128).all()


def test_write_png_rgb_roundtrips_bit_exact(tmp_path):
    """The numpy-SUB-filter PNG writer must round-trip arbitrary RGB data
    bit-exactly through a standard decoder (PIL)."""
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (7, 5, 3), (64, 100, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        p = str(tmp_path / f"rt_{shape[0]}x{shape[1]}.png")
        pilcomp._write_png_rgb(arr, p)
        back = np.array(Image.open(p))
        assert back.dtype == np.uint8 and np.array_equal(back, arr)
    # and a smooth gradient (the filter's best case) too
    g = np.linspace(0, 255, 50 * 60, dtype=np.float64).reshape(50, 60)
    arr = np.dstack([g, g / 2, g / 3]).astype(np.uint8)
    p = str(tmp_path / "grad.png")
    pilcomp._write_png_rgb(arr, p)
    assert np.array_equal(np.array(Image.open(p)), arr)


def test_compose_titled_upscale_cap():
    rgba = np.full((80, 200, 4), 128, np.uint8)
    rgba[..., 3] = 255
    canvas, box = pilcomp.compose_titled(rgba, 1100, "a long title " * 4,
                                         font_pt=9, dpi=220, max_upscale=2.0)
    ox, oy, dw, dh = box
    assert dw == 400 and dh == 160          # capped at 2x, not 1100
    assert canvas.size == (400, oy + 160)
    arr = np.array(canvas.convert("RGB"))
    assert (arr[:oy] < 100).any()           # title still fits (shrunk font)


def test_save_borderless_png_writes_decodable(tmp_path):
    img = np.linspace(0, 1, 60 * 80, dtype=np.float32).reshape(60, 80)
    rgba = colormap_rgba_u8(img, "viridis", 0.0, 1.0)
    out = tmp_path / "x" / "y.png"
    spec = scalebar_spec(80, 60, 10.0, 1.0)
    pilcomp.save_borderless_png(rgba, str(out), dpi=300, out_px=(80, 60),
                                scalebar_spec=spec)
    back = Image.open(out)
    assert back.size == (80, 60)
    np.array(back)  # decodes
