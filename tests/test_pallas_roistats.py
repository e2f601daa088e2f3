"""Pallas per-ROI stats kernel vs the XLA masked_stats oracle (interpret
mode on the CPU backend; the same kernel lowers via Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from imageprocess_tpu.ops.pallas_roistats import roi_stats_pallas
from imageprocess_tpu.ops.stats import STAT_FIELDS, masked_stats


def _case(seed=0, C=2, H=96, W=128, N=5, T=32):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 4000, (C, H, W)).astype(np.float32)
    masks = np.zeros((N, T, T), bool)
    offs = np.zeros((N, 2), np.int32)
    for i in range(N):
        offs[i] = (rng.integers(0, H - T), rng.integers(0, W - T))
        blob = rng.random((T, T)) > 0.6
        masks[i] = blob
    masks[N - 1] = False  # empty ROI
    return imgs, masks, offs


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_stats_match_xla(seed):
    imgs, masks, offs = _case(seed)
    T = masks.shape[1]
    stats = {k: np.asarray(v) for k, v in roi_stats_pallas(
        jnp.asarray(imgs), jnp.asarray(masks), jnp.asarray(offs),
        tile=T, interpret=True,
    ).items()}

    C, N = imgs.shape[0], masks.shape[0]
    for c in range(C):
        for i in range(N):
            y0, x0 = offs[i]
            tile = imgs[c, y0:y0 + T, x0:x0 + T]
            ref = {k: float(v) for k, v in masked_stats(
                jnp.asarray(tile), jnp.asarray(masks[i])).items()}
            for f in STAT_FIELDS:
                got = float(stats[f][c, i])
                want = ref[f]
                if np.isnan(want):
                    assert np.isnan(got) or (f == "npx" and got == 0), (f, got)
                elif f == "npx":
                    assert got == want
                else:
                    assert abs(got - want) <= 1e-4 * max(abs(want), 1e-6), (
                        f, c, i, got, want)


def test_pallas_stats_nonfinite_pixels_excluded():
    """NaN pixels (e.g. QC saturation_to_nan output) inside OR outside the
    mask must not poison mean/std/vsum — the old product-form sum did
    (NaN * 0.0 = NaN) despite the finite-only valid mask."""
    rng = np.random.default_rng(5)
    T = 32
    imgs = rng.integers(0, 4000, (1, 64, 128)).astype(np.float32)
    masks = np.ones((1, T, T), bool)
    masks[0, 3, 4] = False
    offs = np.array([[10, 20]], np.int32)
    imgs[0, 13, 24] = np.nan   # in-tile, masked OUT
    imgs[0, 15, 25] = np.nan   # in-tile, mask ON -> dropped as non-finite
    stats = roi_stats_pallas(jnp.asarray(imgs), jnp.asarray(masks),
                             jnp.asarray(offs), tile=T, interpret=True)
    tile = imgs[0, 10:10 + T, 20:20 + T]
    ref = masked_stats(jnp.asarray(tile), jnp.asarray(masks[0]))
    assert int(stats["npx"][0, 0]) == int(ref["npx"]) == T * T - 2
    for f in ("mean", "std", "vsum", "median", "p5", "p95", "vmin", "vmax"):
        got, want = float(stats[f][0, 0]), float(ref[f])
        assert np.isfinite(got), f
        assert abs(got - want) <= 1e-4 * max(abs(want), 1e-6), (f, got, want)


def test_pallas_hardware_path_rejects_unaligned_offsets():
    """pl.multiple_of is an unchecked compiler promise: on hardware an
    unaligned tile origin reads a shifted tile with no error, so the
    public entry must reject concrete unaligned offsets up front
    (interpret mode has no such constraint — the tests above use it)."""
    T = 32
    imgs = jnp.zeros((1, 64, 256), jnp.float32)
    masks = jnp.ones((1, T, T), bool)
    with pytest.raises(ValueError, match="align"):
        roi_stats_pallas(imgs, masks, np.array([[10, 20]], np.int32),
                         tile=T, interpret=False)
    # aligned origins pass the check (the pallas_call itself needs a TPU,
    # so only the validation layer is exercised here)
    from imageprocess_tpu.ops.pallas_roistats import align_offsets
    aligned = align_offsets(np.array([[10, 20]], np.int32))
    assert (aligned == [[8, 0]]).all()


def test_pallas_stats_negative_values():
    """Bit-space key ordering handles negatives (no clip_neg case)."""
    rng = np.random.default_rng(3)
    T = 32
    imgs = rng.normal(0, 50, (1, 64, 64)).astype(np.float32)
    masks = np.ones((1, T, T), bool)
    offs = np.array([[10, 20]], np.int32)
    stats = roi_stats_pallas(jnp.asarray(imgs), jnp.asarray(masks),
                             jnp.asarray(offs), tile=T, interpret=True)
    tile = imgs[0, 10:10 + T, 20:20 + T]
    assert abs(float(stats["median"][0, 0]) - np.median(tile)) < 1e-4
    assert abs(float(stats["p5"][0, 0]) - np.percentile(tile, 5)) < 1e-3
    assert float(stats["vmin"][0, 0]) == tile.min()
