"""Euclidean distance transform on device.

The reference needs EDT only to build the nuclear-envelope rim mask:
``rim = (EDT(union) > 0) & (EDT(union) <= rim_px)`` with rim_px <= ~10
(src/FRET/Nesprin2_FRET_Builder.py:409-414, rim presets 0.45-1.0 µm at
0.112-0.223 µm/px).

We therefore compute the **radius-clamped squared EDT** exactly: the squared
distance to the nearest background pixel, correct wherever it is <= r^2.
Because the squared-distance kernel dy^2 + dx^2 is additively separable over
a (2r+1)^2 window, the min-convolution splits into a vertical then a
horizontal pass of 2r+1 shifted mins each — O(H*W*r) data-parallel work, no
sequential envelope scan (the scipy algorithm) needed.  Any background pixel
outside the window is farther than r, so the clamp loses nothing.

Out-of-image is NOT background (scipy computes distances within the array
only), so shifted-in values are +inf.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(np.inf)


def _axis_min_pass(d: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """min over offsets o in [-r, r] of (d shifted by o along axis) + o^2,
    treating out-of-image as +inf."""
    out = d  # o = 0 term
    for o in range(1, r + 1):
        sq = jnp.float32(o * o)
        # shift "down" (take from index i-o) and "up" (from i+o)
        lo = jnp.roll(d, o, axis=axis)
        hi = jnp.roll(d, -o, axis=axis)
        idx = jnp.arange(d.shape[axis])
        shape = [1, 1]
        shape[axis] = d.shape[axis]
        idx = idx.reshape(shape)
        lo = jnp.where(idx >= o, lo, _INF)
        hi = jnp.where(idx < d.shape[axis] - o, hi, _INF)
        out = jnp.minimum(out, jnp.minimum(lo, hi) + sq)
    return out


@partial(jax.jit, static_argnames=("r",))
def clamped_sq_edt(fg: jnp.ndarray, r: int) -> jnp.ndarray:
    """Squared distance from each pixel to the nearest False pixel of *fg*,
    exact wherever <= r*r; larger distances return > r*r (possibly +inf)."""
    d0 = jnp.where(fg, _INF, 0.0)
    d1 = _axis_min_pass(d0, r, axis=0)
    return _axis_min_pass(d1, r, axis=1)


@partial(jax.jit, static_argnames=("rim_px",))
def rim_mask(union: jnp.ndarray, rim_px: int) -> jnp.ndarray:
    """``make_inside_rim_mask`` parity (Nesprin2_FRET_Builder.py:409-414):
    pixels inside the union whose distance to the outside is in (0, rim_px]."""
    if rim_px <= 0:
        return union.astype(bool)
    sq = clamped_sq_edt(union.astype(bool), rim_px)
    return union.astype(bool) & (sq <= jnp.float32(rim_px * rim_px))
