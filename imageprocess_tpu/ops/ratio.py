"""Ratiometric FRET math, QC masks, spectral bleed-through correction.

All elementwise — XLA fuses the whole FRET compute into one pass.

Reference semantics:
- epsilon: max(eps_abs, percentile(denominator scoped values, p_floor)),
  eps_abs hardcoded 5.0 (src/FRET/fret_ratio_builder.py:338-340, 472-473;
  src/FRET/Nesprin2_FRET_Builder.py:470-476);
- ratio: (numer + eps) / (denom + eps) (fret_ratio_builder.py:474);
- saturation QC: raw >= threshold -> NaN before any correction
  (Nesprin2_FRET_Builder.py:1415-1421);
- ratio clip QC: ratio > max -> NaN (Nesprin2:1502-1504);
- spectral correction: F_corr = (F - alpha*D - beta*Aonly) * G
  (Nesprin2:460-468).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .percentile import masked_quantile


def pick_epsilon(
    denom: jnp.ndarray,
    scope_mask: Optional[jnp.ndarray] = None,
    eps_abs: float = 5.0,
    p_floor1000: int = 1000,
) -> jnp.ndarray:
    """Stabilizing epsilon from the denominator's low percentile.

    Standalone ops API (NaN-tolerant: non-finite denominators are masked
    out).  The pipelines inline their own eps quantiles because each has
    reference-exact scope/fill semantics — fret has no QC so no NaNs can
    occur (fret_step), Nesprin2 intersects the union with isfinite and
    inf-fills (nesprin2_step) — and those inline forms are what the golden
    parity tests pin."""
    mask = jnp.ones(denom.shape, bool) if scope_mask is None else scope_mask
    mask = mask & jnp.isfinite(denom)
    q = masked_quantile(jnp.where(jnp.isfinite(denom), denom, 0.0), mask, p_floor1000)
    n = mask.sum()
    q = jnp.where(n > 0, q, eps_abs)
    return jnp.maximum(jnp.float32(eps_abs), q)


def ratio_with_eps(numer: jnp.ndarray, denom: jnp.ndarray, eps) -> jnp.ndarray:
    return (numer + eps) / (denom + eps)


def saturation_to_nan(img: jnp.ndarray, sat_threshold: float) -> jnp.ndarray:
    """Mark saturated raw pixels as NaN so they drop out of every later
    statistic (QC gate applied to the *raw* frames).  Per-channel form;
    Nesprin2's pipeline applies the reference's JOINT gate instead (a
    pixel saturated in EITHER channel NaNs both, nesprin2_step:162-165)."""
    return jnp.where(img >= sat_threshold, jnp.nan, img)


def clip_ratio_to_nan(ratio: jnp.ndarray, clip_max: float) -> jnp.ndarray:
    return jnp.where(ratio > clip_max, jnp.nan, ratio)


def spectral_correct(
    fret: jnp.ndarray,
    donor: jnp.ndarray,
    acceptor_only: Optional[jnp.ndarray],
    alpha: float,
    beta: float,
    g_factor: float,
) -> jnp.ndarray:
    """Bleed-through-corrected FRET channel."""
    corr = fret - alpha * donor
    if acceptor_only is not None:
        corr = corr - beta * acceptor_only
    return corr * g_factor
