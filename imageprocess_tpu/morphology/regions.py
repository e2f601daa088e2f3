"""Region properties as segment reductions (regionprops on device).

Replaces ``skimage.measure.regionprops(labeled, intensity_image=...)`` as
used by the FA core (src/INT/FA_Analyzer.py:158-195): per region we need
area, mean intensity, centroid and bbox.  All are scatter reductions keyed
by the compact label image, producing fixed-shape (max_labels,) arrays that
stay on device until the host slices the valid prefix.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_labels",))
def region_props(
    labels: jnp.ndarray,
    intensity: jnp.ndarray,
    max_labels: int = 1024,
) -> Dict[str, jnp.ndarray]:
    """Per-label reductions over a compact int32 label image (0 = bg).

    Returns arrays indexed by label-1 (shape (max_labels,)):
    area (int32), sum/mean intensity, centroid_r/c (pixel-index mean, like
    regionprops ``centroid``), bbox min_r/min_c/max_r/max_c (inclusive),
    plus ``n_labels`` (scalar int32 count of non-empty labels).
    """
    H, W = labels.shape
    flat = labels.ravel()
    n_bins = max_labels + 1

    area = jnp.zeros(n_bins, jnp.int32).at[flat].add(1)
    s = jnp.zeros(n_bins, jnp.float32).at[flat].add(intensity.ravel())

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).ravel()
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).ravel()
    sum_r = jnp.zeros(n_bins, jnp.float32).at[flat].add(rows.astype(jnp.float32))
    sum_c = jnp.zeros(n_bins, jnp.float32).at[flat].add(cols.astype(jnp.float32))
    min_r = jnp.full(n_bins, H, jnp.int32).at[flat].min(rows)
    min_c = jnp.full(n_bins, W, jnp.int32).at[flat].min(cols)
    max_r = jnp.full(n_bins, -1, jnp.int32).at[flat].max(rows)
    max_c = jnp.full(n_bins, -1, jnp.int32).at[flat].max(cols)

    area_l = area[1:]
    nf = jnp.maximum(area_l.astype(jnp.float32), 1.0)
    return {
        "area": area_l,
        "sum": s[1:],
        "mean": s[1:] / nf,
        "centroid_r": sum_r[1:] / nf,
        "centroid_c": sum_c[1:] / nf,
        "min_r": min_r[1:],
        "min_c": min_c[1:],
        "max_r": max_r[1:],
        "max_c": max_c[1:],
        "n_labels": (area_l > 0).sum().astype(jnp.int32),
    }
