"""Unit tests for the pre-colormapped u8 RGBA fast path (report.render).

The savers feed ``colormap_rgba_u8`` output straight to imshow instead of a
float image + cmap, skipping matplotlib's per-draw float64 norm/LUT pass.
These tests pin the contract that made that swap safe: within one 256-step
LUT quantum of mpl's own pipeline, and alpha-0 on non-finite/masked pixels
(the ``_transparent_outside`` behavior of the reference's figure writer,
src/INT/Fluor_INT.py:642-675).
"""

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

from imageprocess_tpu.report.render import colormap_rgba_u8


def _mpl_oracle(img, cmap, vmin, vmax):
    """Matplotlib's own normalize->colormap pipeline as uint8 RGBA."""
    norm = matplotlib.colors.Normalize(vmin=vmin, vmax=vmax, clip=True)
    return (plt.get_cmap(cmap)(norm(img)) * 255.0 + 0.5).astype(np.uint8)


@pytest.mark.parametrize("cmap", ["gray", "jet", "viridis"])
def test_matches_mpl_within_one_lut_step(cmap):
    rng = np.random.default_rng(0)
    img = rng.uniform(-50.0, 4000.0, size=(64, 80)).astype(np.float32)
    ours = colormap_rgba_u8(img, cmap, vmin=0.0, vmax=3500.0)
    ref = _mpl_oracle(img, cmap, 0.0, 3500.0)
    # index quantization may differ by at most one LUT entry at bin edges
    lut = (plt.get_cmap(cmap)(np.linspace(0, 1, 256)) * 255 + 0.5).astype(np.int16)
    step = np.abs(np.diff(lut.astype(np.int16), axis=0)).max()
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16)).max()
    assert diff <= step, (diff, step)
    # and the overwhelming majority of pixels must be exactly equal
    frac_exact = np.mean((ours == ref).all(axis=-1))
    assert frac_exact > 0.97, frac_exact


def test_degenerate_range_is_flat_not_nan():
    img = np.full((8, 8), 7.0, np.float32)
    out = colormap_rgba_u8(img, "gray", vmin=7.0, vmax=7.0)
    assert out.dtype == np.uint8
    assert (out == out[0, 0]).all()


def test_nonfinite_and_mask_get_alpha_zero():
    img = np.ones((4, 4), np.float32)
    img[0, 0] = np.nan
    img[1, 1] = np.inf
    mask = np.ones((4, 4), bool)
    mask[2, 2] = False
    out = colormap_rgba_u8(img, "jet", vmin=0.0, vmax=2.0, mask=mask)
    assert out[0, 0, 3] == 0 and out[1, 1, 3] == 0 and out[2, 2, 3] == 0
    assert out[3, 3, 3] == 255


def test_auto_range_ignores_masked_and_nonfinite():
    img = np.zeros((4, 4), np.float32)
    img[0, 0] = np.nan
    img[3, 3] = 1e9          # masked out below — must not stretch the range
    img[1:3, 1:3] = [[10, 20], [30, 40]]
    mask = np.ones((4, 4), bool)
    mask[3, 3] = False
    out = colormap_rgba_u8(img, "gray", mask=mask)
    # with vmin/vmax from the visible pixels (0..40), the 40-pixel is full white
    assert out[2, 2, 0] == 255
    # and a mid pixel is strictly between black and white
    assert 0 < out[1, 2, 0] < 255


def test_tiny_window_hot_pixels_clip_to_top():
    """Regression: a tiny display window with far-over-range pixels must
    clip to the TOP LUT entry like matplotlib, not wrap through int32
    overflow to the vmin color (hot pixels rendering black)."""
    img = np.zeros((4, 4), np.float32)
    img[1, 1] = 65535.0          # saturated pixel
    img[2, 2] = -65535.0         # far below the window
    with np.errstate(invalid="raise"):  # the old cast also warned here
        out = colormap_rgba_u8(img, "gray", vmin=0.0, vmax=1e-3)
    assert out[1, 1, 0] == 255   # white, not black
    assert out[2, 2, 0] == 0
    assert out[0, 0, 0] == 0


def test_all_masked_frame_does_not_crash():
    img = np.full((4, 4), np.nan, np.float32)
    out = colormap_rgba_u8(img, "gray")
    assert out.shape == (4, 4, 4) and (out[..., 3] == 0).all()
