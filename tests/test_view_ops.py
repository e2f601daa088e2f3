"""View-pipeline op oracles (scipy-based; skimage not installed here)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from imageprocess_tpu.ops.view import (
    clahe, dog_bandpass, gaussian_blur, sobel_magnitude, stretch_view,
)

import jax.numpy as jnp


def _img(seed=0, shape=(96, 128)):
    return np.random.default_rng(seed).random(shape).astype(np.float32) * 100


@pytest.mark.parametrize("sigma", [1.0, 2.5])
def test_gaussian_blur_vs_scipy(sigma):
    x = _img()
    ours = np.asarray(gaussian_blur(jnp.asarray(x), sigma))
    ref = ndi.gaussian_filter(x, sigma)  # scipy defaults, as the drawer uses
    assert np.allclose(ours, ref, atol=1e-3)


def test_dog_bandpass():
    x = _img(1)
    ours = np.asarray(dog_bandpass(jnp.asarray(x), 1.0, 3.0))
    ref = ndi.gaussian_filter(x, 1.0) - ndi.gaussian_filter(x, 3.0)
    assert np.allclose(ours, ref, atol=1e-2)


def test_sobel_magnitude_vs_scipy():
    x = _img(2)
    ours = np.asarray(sobel_magnitude(jnp.asarray(x)))
    gx = ndi.sobel(x, axis=1, mode="reflect") / 4.0
    gy = ndi.sobel(x, axis=0, mode="reflect") / 4.0
    ref = np.hypot(gx, gy) / np.sqrt(2.0)
    assert np.allclose(ours, ref, atol=2e-3)


def test_stretch_view_matches_numpy():
    x = _img(3)
    out = np.asarray(stretch_view(jnp.asarray(x), jnp.int32(1000),
                                  jnp.int32(99000), jnp.float32(2.0),
                                  jnp.int32(0)))
    lo, hi = np.percentile(x, 1), np.percentile(x, 99)
    ref = np.clip((x - lo) / (hi - lo), 0, 1) ** 0.5
    assert np.allclose(out, ref, atol=1e-5)
    inv = np.asarray(stretch_view(jnp.asarray(x), jnp.int32(1000),
                                  jnp.int32(99000), jnp.float32(2.0),
                                  jnp.int32(1)))
    assert np.allclose(inv, 1.0 - ref, atol=1e-5)


def _clahe_numpy_oracle(img, clip_limit=0.01, ntiles_y=8, ntiles_x=8,
                        nbins=256):
    """Independent numpy replica of the documented CLAHE semantics
    (skimage.exposure.equalize_adapthist-style; reference call site
    roi_manual_drawer.py:880-887): pad to a tile-multiple canvas, per-tile
    clipped histogram with uniform excess redistribution, CDF normalized to
    its own total, then bilinear blending between the 4 surrounding tile
    mappings with tile-center anchors clamped at the borders.

    Written as plain per-tile / per-pixel loops so it shares no code shape
    with the vectorized jitted implementation it checks.
    """
    H, W = img.shape
    th = -(-H // ntiles_y)
    tw = -(-W // ntiles_x)
    Hp, Wp = th * ntiles_y, tw * ntiles_x
    pad_mode = "reflect" if (Hp - H) < H and (Wp - W) < W else "edge"
    x = np.pad(img, ((0, Hp - H), (0, Wp - W)), mode=pad_mode)
    bins = np.clip((x * (nbins - 1)).astype(np.int64), 0, nbins - 1)

    # one clipped+renormalized CDF per tile, via bincount per tile
    npx = float(th * tw)
    limit = max(clip_limit * npx, 1.0)
    cdfs = np.empty((ntiles_y, ntiles_x, nbins), np.float64)
    for ty in range(ntiles_y):
        for tx in range(ntiles_x):
            tile = bins[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            h = np.bincount(tile.ravel(), minlength=nbins).astype(np.float64)
            excess = np.maximum(h - limit, 0.0).sum()
            h = np.minimum(h, limit) + excess / nbins
            c = np.cumsum(h)
            cdfs[ty, tx] = c / c[-1]

    # bilinear blend between the 4 surrounding tile mappings
    out = np.empty((Hp, Wp), np.float64)
    for r in range(Hp):
        cy = (r - (th - 1) / 2.0) / th
        y0 = min(max(int(np.floor(cy)), 0), ntiles_y - 1)
        y1 = min(y0 + 1, ntiles_y - 1)
        wy = min(max(cy - y0, 0.0), 1.0)
        for c in range(Wp):
            cx = (c - (tw - 1) / 2.0) / tw
            x0 = min(max(int(np.floor(cx)), 0), ntiles_x - 1)
            x1 = min(x0 + 1, ntiles_x - 1)
            wx = min(max(cx - x0, 0.0), 1.0)
            b = bins[r, c]
            top = (1 - wx) * cdfs[y0, x0][b] + wx * cdfs[y0, x1][b]
            bot = (1 - wx) * cdfs[y1, x0][b] + wx * cdfs[y1, x1][b]
            out[r, c] = (1 - wy) * top + wy * bot
    return out[:H, :W].astype(np.float32)


@pytest.mark.parametrize("shape,clip", [((96, 128), 0.01), ((64, 64), 1.0),
                                        ((50, 70), 0.03)])
def test_clahe_parity_vs_numpy_oracle(shape, clip):
    # real-ish content: smooth gradient + texture + a bright blob, in [0,1]
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    img = (0.3 * yy / shape[0] + 0.1 * rng.random(shape, np.float32)
           + 0.5 * np.exp(-((yy - 20) ** 2 + (xx - 30) ** 2) / 200.0))
    img = (img / img.max()).astype(np.float32)
    ours = np.asarray(clahe(jnp.asarray(img), jnp.float32(clip)))
    ref = _clahe_numpy_oracle(img, clip_limit=clip)
    assert np.abs(ours - ref).max() <= 1e-3


def test_clahe_parity_nondefault_grid():
    img = _img(11, (60, 90)) / 100.0
    ours = np.asarray(clahe(jnp.asarray(img), jnp.float32(0.02),
                            ntiles_y=4, ntiles_x=6, nbins=128))
    ref = _clahe_numpy_oracle(img, 0.02, ntiles_y=4, ntiles_x=6, nbins=128)
    assert np.abs(ours - ref).max() <= 1e-3


def test_clahe_properties():
    # flat image stays flat; contrast increases on a low-contrast gradient
    flat = np.full((64, 64), 0.5, np.float32)
    out = np.asarray(clahe(jnp.asarray(flat)))
    assert out.shape == (64, 64)
    assert float(out.std()) < 0.2

    yy = np.linspace(0.45, 0.55, 64, dtype=np.float32)
    grad = np.tile(yy[:, None], (1, 64))
    out2 = np.asarray(clahe(jnp.asarray(grad), jnp.float32(1.0)))
    assert float(out2.std()) > float(grad.std())  # equalization spreads values
    assert 0.0 <= float(out2.min()) and float(out2.max()) <= 1.0

def test_clahe_reduces_to_global_hist_eq():
    """External anchor that is NOT a replica of the implementation: with a
    single 1x1 tile grid and clip_limit=1.0 (no clipping possible), CLAHE
    is DEFINED (Zuiderveld, Graphics Gems IV; the algorithm behind
    skimage.exposure.equalize_adapthist) to reduce to plain global
    histogram equalization — each pixel maps to the inclusive empirical
    CDF of its bin.  That expected value is computed here straight from
    the textbook definition in three lines."""
    rng = np.random.default_rng(3)
    img = rng.random((64, 64)).astype(np.float32)
    nbins = 256
    ours = np.asarray(clahe(jnp.asarray(img), jnp.float32(1.0),
                            ntiles_y=1, ntiles_x=1, nbins=nbins))
    bins = np.clip((img * (nbins - 1)).astype(np.int64), 0, nbins - 1)
    hist = np.bincount(bins.ravel(), minlength=nbins)
    cdf = np.cumsum(hist) / bins.size           # inclusive empirical CDF
    expected = cdf[bins].astype(np.float32)     # textbook hist-eq mapping
    assert np.abs(ours - expected).max() <= 1e-5
