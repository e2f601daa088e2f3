"""Pallas TPU kernel: fused u16 order-statistic search for tile stats.

The quantile order statistics are the expensive part of per-ROI tile
statistics: the XLA bisection (ops.tilestats_u16) re-reads the tile batch
from HBM on each of its 16 compare+count steps, and the older sort path
ran a sorting network per (B, N, C).  This kernel keeps each ROI's
(C, t*t) pixels RESIDENT IN VMEM across the whole 16-step bisection on the
u16 value range, advancing all C*6 searches together as ONE (C*6, P)
compare + per-row count per step — the round-1 lesson applied
(ops.pallas_roistats was latency-bound on 6 sequential scalar searches x
32 float-key steps per program).

Scope: ONLY the six raw-u16 order statistics per (B, N, C) come out of the
kernel; moments, the background transform and the np.percentile-linear
interpolation stay in single-pass XLA (ops.tilestats_u16 with
``order_stats=``) — they are not the bottleneck and XLA fuses them fine.

Layout notes (Mosaic): tiles are pre-flattened to (B, N, C, P) and masks
to (B, N, 1, P) on the host side so every in-kernel array is 2-D;
per-(quantile, channel) scalars ride (C*6, 1) columns; the static
percentile targets enter as a (C*6, 2) int input (kernels may not capture
traced constants).

CPU/debug: ``interpret=True`` (tests use it).  Production uses the XLA
bisection (ops.tilestats_u16): on the tunneled v5e both variants sit on
the ~28 ms per-dispatch floor (sort 54.6 ms / XLA bisect 29.4 / this
kernel + XLA moments 30.1 at bench shapes), so the simpler, CPU-testable
form wins; this kernel is compiled-and-verified on hardware and stands by
for an environment where the dispatch floor is sub-millisecond.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .percentile import exact_quantile_pos

U16_MAX = 65535


def _kernel(tiles_ref, masks_ref, pk_ref, out_ref):
    C = tiles_ref.shape[2]
    R = C * 6
    x = tiles_ref[0, 0].astype(jnp.int32)        # (C, P)
    m = masks_ref[0, 0]                          # (1, P) bool

    # replicate each channel row 6x -> (C*6, P), row r = channel r // 6
    xr = jnp.concatenate([x[c:c + 1] for c in range(C) for _ in range(6)], 0)

    n = jnp.sum(jnp.where(m, 1, 0))              # scalar masked count
    # exact np.percentile (k) positions, vectorized over the (R, 1) rows:
    # pk[:, 0] = p1000 target, pk[:, 1] = 0 or 1 (the k / k+1 pair)
    p = pk_ref[:, 0:1]                           # (R, 1) i32
    plus = pk_ref[:, 1:2]
    nm1 = jnp.maximum(n - 1, 0)
    # the ONE exact np.percentile (k, g) arithmetic, broadcast over the
    # (R, 1) percentile column (pure jnp int math, Mosaic-safe); g unused —
    # interpolation happens in tile_stats_u16 after the bg transform
    k0, _ = exact_quantile_pos(n, p)
    k = jnp.clip(k0 + plus, 0, nm1)              # (R, 1)

    lo = jnp.zeros((R, 1), jnp.int32)
    hi = jnp.full((R, 1), U16_MAX, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1                     # (R, 1)
        le = m & (xr <= mid)                     # (R, P)
        cnt = jnp.sum(jnp.where(le, 1, 0), axis=1, keepdims=True)
        ge = cnt >= k + 1
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    _, hi = jax.lax.fori_loop(0, 16, body, (lo, hi))
    out_ref[0, 0] = hi                           # (R, 1)


@partial(jax.jit, static_argnames=("p_lo1000", "p_hi1000", "interpret"))
def batched_order_stats_pallas(
    tiles: jnp.ndarray,     # (B, N, C, t, t) uint16 RAW tile pixels
    masks: jnp.ndarray,     # (B, N, t, t) bool
    *,
    p_lo1000: int = 5000,
    p_hi1000: int = 95000,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, C, 6) exact order statistics of the masked raw u16 values:
    (k, k+1) for each of p_lo / median / p_hi, np.percentile positions."""
    B, N, C, t, _ = tiles.shape
    P = t * t
    R = C * 6
    xf = tiles.reshape(B, N, C, P)
    mf = masks.reshape(B, N, 1, P)
    # row r = channel (r // 6), position (r % 6): 3x k then 3x k+1
    pk = np.array(
        [[p, plus]
         for _ in range(C)
         for plus in (0, 1)
         for p in (p_lo1000, 50000, p_hi1000)],
        np.int32,
    )
    out = pl.pallas_call(
        _kernel,
        grid=(B, N),
        in_specs=[
            pl.BlockSpec((1, 1, C, P), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, P), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pk, whole (R, 2)
        ],
        out_specs=pl.BlockSpec((1, 1, R, 1), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, R, 1), jnp.int32),
        interpret=interpret,
    )(xf, mf, jnp.asarray(pk))
    # rows per channel: [p5_k, med_k, p95_k, p5_k1, med_k1, p95_k1]
    os_ = out.reshape(B, N, C, 2, 3)
    return jnp.concatenate([os_[..., 0, :], os_[..., 1, :]], axis=-1)
