"""Pallas TPU kernel: single-pass per-ROI masked statistics.

The per-ROI stats path is HBM-bandwidth-bound: for each (ROI, channel) the
XLA tiled path (ops.roistats) re-reads the tile for the moment reductions
and again inside the O(T^2 log T^2) sort for the three quantiles.  This
kernel computes ALL nine reference statistics (mean, median, std ddof=0,
p5, p95, min, max, sum, count — src/INT/Fluor_INT.py:494-538 semantics) in
ONE pass over each ROI's bbox tile:

- grid = (N_roi, C); each program DMAs its (T, T) tile from the frame in
  HBM into VMEM using scalar-prefetched bbox offsets
  (PrefetchScalarGridSpec), so HBM traffic is the theoretical minimum
  (tile bytes x N x C);
- moments (count/sum/sumsq/min/max) are VPU reductions in VMEM;
- the three quantiles are EXACT order statistics found by binary search
  over the monotone int32 key space of IEEE-754 floats (32 fixed
  iterations, each a masked compare+popcount in VMEM — no sort, no HBM
  re-read), interpolated with np.percentile's linear rule via the same
  exact integer (k, g) arithmetic as ops.percentile.

CPU/debug: pass ``interpret=True`` (tests do); on TPU the kernel lowers
through Mosaic (verified on v5e: compiles, parity vs the XLA oracle).

Measured reality check (v5e, 24 ROI x 2 ch, 256^2 tiles): this kernel is
~28 ms — latency-bound on its 32-step sequential search (192 small VPU
reduces per program) — while the XLA batched-sort path (ops.roistats) runs
the same workload in ~1.2 ms by trading extra FLOPs for full-width
parallelism.  Production pipelines therefore use the XLA path; this kernel
stays as the scalar-prefetch + dynamic-DMA-gather reference pattern.

Round-2 successor: ops.tilestats_u16 — the 16-step u16 value-range
bisection vectorized across ALL (B, N, C, quantile) lanes, which IS wired
into the production tile path (ops.roistats.tile_stats_from_gathered,
u16 branch) — and ops.pallas_tilestats, the VMEM-resident kernel variant
of the same bisection, verified on v5e but unwired because it only ties
XLA under the tunneled dispatch floor (numbers in
tests/test_pallas_tilestats.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .percentile import exact_quantile_pos

_MIN_I32 = -2147483648  # python int: jnp constants may not be captured by kernels
_NSTAT = 16  # padded stats row (lane-friendly); 10 used


def _sortable_key(x: jnp.ndarray) -> jnp.ndarray:
    """IEEE-754 float32 -> int32, monotone in the float ordering
    (involution; -0.0 maps with +0.0)."""
    b = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(b >= 0, b, jnp.int32(_MIN_I32) - b)


def _key_to_float(s: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _sortable_key for a SCALAR key.  Mosaic's bitcast is
    vector-only, so the conversion rides a small (8, 128) broadcast."""
    b = jnp.where(s >= 0, s, jnp.int32(_MIN_I32) - s)
    vec = jnp.full((8, 128), b, jnp.int32)
    return jax.lax.bitcast_convert_type(vec, jnp.float32)[0, 0]


def _order_stats6(keys, valid, n, ks):
    """Six order statistics via ONE 32-step binary-search loop carrying six
    scalar bound pairs; the six masked compare+popcounts per iteration are
    Python-unrolled (Mosaic-friendly scalar broadcasts over the VMEM tile,
    free to ILP-overlap) instead of six separate loops."""
    ks = [jnp.clip(k, 0, jnp.maximum(n - 1, 0)) for k in ks]
    lo0 = tuple(jnp.int32(_MIN_I32) for _ in range(6))
    hi0 = tuple(jnp.int32(2147483647) for _ in range(6))

    def body(_, lohi):
        lo, hi = lohi
        new_lo, new_hi = [], []
        for j in range(6):
            # overflow-free signed floor((lo + hi) / 2): plain difference
            # wraps when the bounds span the whole int32 key range
            mid = (lo[j] & hi[j]) + ((lo[j] ^ hi[j]) >> 1)
            cnt = jnp.sum(jnp.where(valid & (keys <= mid), 1, 0))
            ge = cnt >= ks[j] + 1
            new_lo.append(jnp.where(ge, lo[j], mid + 1))
            new_hi.append(jnp.where(ge, mid, hi[j]))
        return tuple(new_lo), tuple(new_hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo0, hi0))
    return hi


def _kernel(offs_ref, plohi_ref, img_ref, masks_ref, out_ref, tile_ref, sem):
    i = pl.program_id(0)
    c = pl.program_id(1)
    # offsets must be (8, 128)-aligned (host guarantees; see align_offsets)
    # so the HBM tile slice lands on the native (8, 128) memref tiling
    y0 = pl.multiple_of(offs_ref[i, 0], 8)
    x0 = pl.multiple_of(offs_ref[i, 1], 128)
    T = tile_ref.shape[0]

    copy = pltpu.make_async_copy(
        img_ref.at[c, pl.ds(y0, T), pl.ds(x0, T)], tile_ref, sem
    )
    copy.start()
    copy.wait()

    t = tile_ref[:]
    m = masks_ref[0]
    valid = m & jnp.isfinite(t)
    n = jnp.sum(jnp.where(valid, 1, 0))
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    # where(), not t * mf: a non-finite pixel ANYWHERE in the tile (QC NaN
    # inside the mask, or garbage outside it) would poison the product sum
    # (NaN * 0.0 = NaN) despite the finite-only `valid` mask
    s = jnp.sum(jnp.where(valid, t, 0.0))
    mean = s / nf
    var = jnp.sum(jnp.where(valid, (t - mean) * (t - mean), 0.0)) / nf
    vmin = jnp.min(jnp.where(valid, t, jnp.inf))
    vmax = jnp.max(jnp.where(valid, t, -jnp.inf))

    keys = _sortable_key(jnp.where(valid, t, 0.0))

    # the ONE exact np.percentile (k, g) arithmetic (pure jnp scalar math,
    # Mosaic-safe) — do not re-inline it here
    k_lo, g_lo = exact_quantile_pos(n, plohi_ref[0, 0])
    k_md, g_md = exact_quantile_pos(n, jnp.int32(50000))
    k_hi, g_hi = exact_quantile_pos(n, plohi_ref[0, 1])
    ks = [k_lo, k_lo + 1, k_md, k_md + 1, k_hi, k_hi + 1]
    os6 = _order_stats6(keys, valid, n, ks)

    def interp(j, g):
        lo_v = _key_to_float(os6[j])
        hi_v = _key_to_float(os6[j + 1])
        return lo_v + g * (hi_v - lo_v)

    p5 = interp(0, g_lo)
    med = interp(2, g_md)
    p95 = interp(4, g_hi)

    empty = n == 0
    nan = jnp.float32(jnp.nan)
    row = jnp.concatenate([
        jnp.where(empty, nan, mean)[None],
        jnp.where(empty, nan, med)[None],
        jnp.where(empty, nan, jnp.sqrt(var))[None],
        jnp.where(empty, nan, p5)[None],
        jnp.where(empty, nan, p95)[None],
        jnp.where(empty, nan, vmin)[None],
        jnp.where(empty, nan, vmax)[None],
        jnp.where(empty, nan, s)[None],
        n.astype(jnp.float32)[None],
        jnp.zeros((_NSTAT - 9,), jnp.float32),
    ])
    out_ref[0, c] = row


def align_offsets(offsets: np.ndarray) -> np.ndarray:
    """Round tile origins down to the TPU memref tiling (rows to 8, cols to
    128) so the kernel's HBM DMA slices are provably aligned.  Callers must
    size tiles with matching margin (bbox + 7 rows / 127 cols)."""
    out = np.asarray(offsets, np.int32).copy()
    out[:, 0] -= out[:, 0] % 8
    out[:, 1] -= out[:, 1] % 128
    return out


def roi_stats_pallas(
    imgs: jnp.ndarray,      # (C, H, W) float32
    masks: jnp.ndarray,     # (N, T, T) bool (tile-local, validity applied)
    offsets: jnp.ndarray,   # (N, 2) int32 tile origins
    p_lo1000: int = 5000,
    p_hi1000: int = 95000,
    *,
    tile: int,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """All nine per-(channel, ROI) statistics in one fused kernel pass.
    Returns the ops.stats.STAT_FIELDS dict of (C, N) arrays.

    On hardware (interpret=False) tile origins MUST be (8, 128)-aligned:
    ``pl.multiple_of`` is an unchecked compiler promise, so an unaligned
    DMA would read a shifted tile with no error.  Concrete offsets are
    validated here; offsets traced under an outer jit keep the alignment
    contract on the caller (use :func:`align_offsets`)."""
    if not interpret:
        try:
            o = np.asarray(offsets)
        except Exception:  # traced value: cannot inspect, contract applies
            o = None
        if o is not None and ((o[:, 0] % 8).any() or (o[:, 1] % 128).any()):
            raise ValueError(
                "roi_stats_pallas on hardware requires (8, 128)-aligned "
                "tile origins; apply align_offsets() and size tiles with "
                "matching margin (interpret=True has no such constraint)")
    return _roi_stats_pallas_jit(imgs, masks, offsets, p_lo1000, p_hi1000,
                                 tile=tile, interpret=interpret)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def _roi_stats_pallas_jit(
    imgs: jnp.ndarray,
    masks: jnp.ndarray,
    offsets: jnp.ndarray,
    p_lo1000: int = 5000,
    p_hi1000: int = 95000,
    *,
    tile: int,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    C = imgs.shape[0]
    N = masks.shape[0]
    plohi = jnp.asarray([[p_lo1000, p_hi1000]], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offsets, plohi
        grid=(N, C),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # imgs stay in HBM
            pl.BlockSpec((1, tile, tile), lambda i, c, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # block covers all channels (Mosaic: trailing two block dims must be
        # full or (8, 128)-aligned); program (i, c) writes its own row
        out_specs=pl.BlockSpec((1, C, _NSTAT), lambda i, c, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N, C, _NSTAT), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, plohi, imgs, masks)

    out = out.transpose(1, 0, 2)  # (C, N, stats)
    return {
        "mean": out[..., 0],
        "median": out[..., 1],
        "std": out[..., 2],
        "p5": out[..., 3],
        "p95": out[..., 4],
        "vmin": out[..., 5],
        "vmax": out[..., 6],
        "vsum": out[..., 7],
        "npx": out[..., 8].astype(jnp.int32),
    }
