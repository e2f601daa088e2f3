"""Segmentation U-Net: shapes, training convergence smoke, sharded train
step on the 8-device CPU mesh, checkpoint round trip, tiled inference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imageprocess_tpu.models import (
    TrainConfig, UNet, create_train_state, make_sharded_train_step, train_step,
)
from imageprocess_tpu.models.train import synthetic_batch


@pytest.fixture(scope="module")
def tiny_cfg():
    return TrainConfig(features=(8, 16), tile=32, batch_size=4, lr=3e-3)


@pytest.fixture(scope="module")
def tiny_state(tiny_cfg):
    return create_train_state(tiny_cfg, jax.random.PRNGKey(0))


def test_unet_output_shape(tiny_state, tiny_cfg):
    x = jnp.zeros((2, tiny_cfg.tile, tiny_cfg.tile, 1))
    out = tiny_state.apply_fn(tiny_state.params, x)
    assert out.shape == (2, tiny_cfg.tile, tiny_cfg.tile, 3)
    assert out.dtype == jnp.float32


def test_train_step_decreases_loss(tiny_state, tiny_cfg):
    rng = np.random.default_rng(0)
    imgs, probs, grads = synthetic_batch(rng, tiny_cfg.batch_size, tiny_cfg.tile)
    state = tiny_state
    losses = []
    for _ in range(12):
        state, loss = train_step(state, jnp.asarray(imgs), jnp.asarray(probs),
                                 jnp.asarray(grads))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_sharded_train_step(tiny_cfg):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imageprocess_tpu.parallel.runner import make_mesh

    mesh = make_mesh(8)
    state = create_train_state(tiny_cfg, jax.random.PRNGKey(1))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_sharded_train_step(mesh)
    rng = np.random.default_rng(1)
    imgs, probs, grads = synthetic_batch(rng, 8, tiny_cfg.tile)
    shard = NamedSharding(mesh, P("batch"))
    state2, loss = step(
        state,
        jax.device_put(jnp.asarray(imgs), shard),
        jax.device_put(jnp.asarray(probs), shard),
        jax.device_put(jnp.asarray(grads), shard),
    )
    assert int(state2.step) == 1 and np.isfinite(float(loss))


@pytest.mark.filterwarnings("ignore:Sharding info not provided")
def test_checkpoint_roundtrip(tiny_state, tmp_path):
    from imageprocess_tpu.models.checkpoint import load_checkpoint, save_checkpoint

    save_checkpoint(str(tmp_path / "ckpt"), tiny_state.params)
    restored = load_checkpoint(str(tmp_path / "ckpt"), like=tiny_state.params)
    leaves_a = jax.tree_util.tree_leaves(tiny_state.params)
    leaves_b = jax.tree_util.tree_leaves(restored)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_segment_frame_unet_structural(tiny_state, tiny_cfg):
    """Random-init net: inference machinery produces valid polygon output
    (count depends on weights; shape/typing is what's pinned)."""
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    img = np.random.default_rng(0).normal(100, 10, (70, 90)).astype(np.float32)
    polys = segment_frame_unet(
        img, tiny_state.apply_fn, tiny_state.params,
        tile=tiny_cfg.tile, overlap=4, min_size_px=5,
    )
    for p in polys:
        assert p.ndim == 2 and p.shape[1] == 2


def test_segment_frame_unet_sharded_matches_single(tiny_state, tiny_cfg):
    """Mesh-sharded tile-batch inference (roi-auto --devices N) returns the
    same instance polygons as the single-device path: the batch axis is
    data-parallel, so GSPMD partitioning cannot change per-tile math."""
    from imageprocess_tpu.parallel.runner import make_mesh
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    img = np.random.default_rng(3).normal(100, 20, (96, 130)).astype(np.float32)
    kw = dict(tile=tiny_cfg.tile, overlap=4, min_size_px=5,
              prob_threshold=0.3)
    single = segment_frame_unet(img, tiny_state.apply_fn, tiny_state.params,
                                **kw)
    sharded = segment_frame_unet(img, tiny_state.apply_fn, tiny_state.params,
                                 mesh=make_mesh(8), **kw)
    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(a, b)


def test_pretrained_unet_backend(tmp_path):
    """The bundled checkpoint segments synthetic blob frames end-to-end
    through the auto-drawer unet backend."""
    import os

    from imageprocess_tpu.core import roiio, tiffio
    from imageprocess_tpu.models.train import synthetic_batch
    from imageprocess_tpu.segment.auto import (
        DEFAULT_UNET_CKPT, AutoSegConfig, run_auto_drawer,
    )

    if not os.path.exists(os.path.join(DEFAULT_UNET_CKPT, "config.json")):
        pytest.skip("bundled checkpoint not present")
    imgs, probs, _ = synthetic_batch(np.random.default_rng(5), 1, 128)
    frame = (imgs[0, ..., 0] * 10000).clip(0, 65535).astype(np.uint16)
    tiffio.write_tiff16(str(tmp_path / "S01_1.TIF"), frame)
    cfg = AutoSegConfig(backend="unet", channel=1, min_size_px=30)
    written = run_auto_drawer(str(tmp_path), cfg, log=lambda *_: None)
    assert len(written) == 1
    bundle = roiio.load_roi_bundle(written[0])
    assert bundle["generated_by"] == "imageprocess_tpu.unet"
    n_true = int((probs[0] > 0.5).sum() > 0)
    assert len(bundle["rois"]) >= n_true  # finds at least one blob
