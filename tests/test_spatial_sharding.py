"""Spatially-sharded single-frame ops vs single-device oracles, on the
8-virtual-device CPU mesh (halo exchange + psum collectives)."""

import numpy as np
import pytest

import jax.numpy as jnp

from imageprocess_tpu.parallel.runner import make_mesh
from imageprocess_tpu.parallel.spatial import (
    shard_frame,
    sharded_bg_correct_u16,
    sharded_quantile_u16,
    sharded_square_dilation,
    sharded_square_erosion,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="rows")


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(0)
    return rng.integers(0, 4000, (256, 192)).astype(np.uint16)


@pytest.mark.parametrize("p", [1.0, 50.0, 99.0])
def test_sharded_quantile_exact(mesh, frame, p):
    run = sharded_quantile_u16(mesh, int(p * 1000))
    got = float(run(shard_frame(mesh, frame)))
    want = float(np.percentile(frame.astype(np.float64).ravel(), p))
    assert abs(got - want) < 1e-6


def test_sharded_bg_correct(mesh, frame):
    run = sharded_bg_correct_u16(mesh, 1000)
    out = np.asarray(run(shard_frame(mesh, frame)))
    bg = np.percentile(frame.astype(np.float64).ravel(), 1.0)
    want = np.clip(frame.astype(np.float32) - bg, 0, None)
    assert np.allclose(out, want, atol=1e-3)


@pytest.mark.parametrize("k", [1, 3])
def test_sharded_square_dilation_matches_single_device(mesh, k):
    import scipy.ndimage as ndi

    rng = np.random.default_rng(1)
    fg = (rng.random((256, 192)) > 0.97)
    run = sharded_square_dilation(mesh, k)
    got = np.asarray(run(shard_frame(mesh, fg)))
    want = ndi.binary_dilation(fg, np.ones((2 * k + 1, 2 * k + 1), bool))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("k", [1, 3])
def test_sharded_square_erosion_matches_single_device(mesh, k):
    """Erosion needs the +inf halo identity at edge shards: a zeros-pad
    halo (the round-1 bug class) would erode away every shard-boundary
    row.  Oracle = single-device reduce_window min with SAME padding
    (border acts foreground)."""
    import jax

    rng = np.random.default_rng(2)
    fg = (rng.random((256, 192)) > 0.3)
    fg[24:48, 50:100] = True  # solid block across the 32-row shard boundary
    run = sharded_square_erosion(mesh, k)
    got = np.asarray(run(shard_frame(mesh, fg)))
    want = np.asarray(
        jax.lax.reduce_window(
            jnp.asarray(fg, jnp.float32), jnp.inf, jax.lax.min,
            (2 * k + 1, 2 * k + 1), (1, 1), "SAME",
        ) > 0.5
    )
    assert np.array_equal(got, want)
    # and it must differ from what a zeros-filled halo would produce:
    # interior foreground rows adjacent to shard boundaries survive
    assert got.any()
