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
