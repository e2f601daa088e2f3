"""Masked per-ROI statistics as device reductions.

Replaces the reference's per-ROI ``img[mask]`` gathers + numpy reductions
(src/INT/Fluor_INT.py:494-538) with fixed-shape masked reductions that
vmap over a stacked (N_roi, H, W) mask tensor — fully jit/shard-compatible.

Per ROI and channel: mean, median, std (ddof=0, two-pass like np.std),
p5, p95, min, max, sum, count — computed over *finite* masked values.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .percentile import quantile_from_sorted

STAT_FIELDS = ("mean", "median", "std", "p5", "p95", "vmin", "vmax", "vsum", "npx")


def masked_stats(
    img: jnp.ndarray,
    mask: jnp.ndarray,
    p_lo1000: int = 5000,
    p_hi1000: int = 95000,
) -> Dict[str, jnp.ndarray]:
    """All nine reference statistics of img[mask] (finite values only)."""
    valid = mask & jnp.isfinite(img)
    n = valid.sum().astype(jnp.int32)
    nf = n.astype(jnp.float32)

    zeroed = jnp.where(valid, img, 0.0)
    total = zeroed.sum()
    mean = total / jnp.maximum(nf, 1.0)
    var = (jnp.where(valid, (img - mean) ** 2, 0.0)).sum() / jnp.maximum(nf, 1.0)
    std = jnp.sqrt(var)
    vmin = jnp.where(valid, img, jnp.inf).min()
    vmax = jnp.where(valid, img, -jnp.inf).max()

    xs = jnp.sort(jnp.where(valid, img, jnp.inf).ravel())
    median = quantile_from_sorted(xs, n, 50000)
    p5 = quantile_from_sorted(xs, n, p_lo1000)
    p95 = quantile_from_sorted(xs, n, p_hi1000)

    empty = n == 0
    nanify = lambda v: jnp.where(empty, jnp.nan, v)
    return {
        "mean": nanify(mean),
        "median": median,
        "std": nanify(std),
        "p5": p5,
        "p95": p95,
        "vmin": nanify(vmin),
        "vmax": nanify(vmax),
        "vsum": nanify(total),
        "npx": n,
    }


def roi_stats(
    imgs: jnp.ndarray,
    masks: jnp.ndarray,
    p_lo1000: int = 5000,
    p_hi1000: int = 95000,
) -> Dict[str, jnp.ndarray]:
    """Stats for every (channel, roi) pair.

    imgs: (C, H, W) float32; masks: (N, H, W) bool -> dict of (C, N) arrays
    (npx is (C, N) int32; identical across channels unless NaNs differ).
    """
    per_roi = jax.vmap(lambda m, im: masked_stats(im, m, p_lo1000, p_hi1000),
                       in_axes=(0, None))
    per_ch = jax.vmap(lambda im: per_roi(masks, im))
    return per_ch(imgs)


def auto_minmax(
    img: jnp.ndarray,
    p_lo1000: int = 1000,
    p_hi1000: int = 99000,
    mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Display range at finite percentiles with a hi > lo guard
    (Fluor_INT.py:540-548)."""
    valid = jnp.isfinite(img)
    if mask is not None:
        valid = valid & mask
    n = valid.sum().astype(jnp.int32)
    xs = jnp.sort(jnp.where(valid, img, jnp.inf).ravel())
    lo = quantile_from_sorted(xs, n, p_lo1000)
    hi = quantile_from_sorted(xs, n, p_hi1000)
    lo = jnp.where(n > 0, lo, 0.0)
    hi = jnp.where(n > 0, hi, 1.0)
    # the reference adds a flat 1e-6 in float64; in float32 that is a no-op
    # for lo >= ~16 (ulp exceeds 1e-6), returning hi == lo and breaking the
    # hi > lo contract (division by zero downstream) — so the epsilon
    # scales with |lo| (same guard idiom as view.stretch_view)
    eps = jnp.maximum(jnp.float32(1e-6), jnp.abs(lo) * jnp.float32(1e-6))
    hi = jnp.where(hi <= lo, lo + eps, hi)
    return lo, hi
