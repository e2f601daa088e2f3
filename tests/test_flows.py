"""Flow-following instance separation (segment.flows) — the Cellpose
follow_flows analogue on device (reference: the torch path behind
src/ROI_auto_drawer.py:241; our U-Net trains the same center-pointing
flow targets, models/golden.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from imageprocess_tpu.segment.flows import flow_label, follow_flows


def _two_cell_scene(H=96, W=128, c1=(48, 40), c2=(48, 80), r=22):
    """Two horizontally touching discs + analytic center-pointing flows."""
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    d1 = np.sqrt((yy - c1[0]) ** 2 + (xx - c1[1]) ** 2)
    d2 = np.sqrt((yy - c2[0]) ** 2 + (xx - c2[1]) ** 2)
    fg = (d1 <= r) | (d2 <= r)
    # each pixel's flow points at ITS cell's center (nearer center wins)
    use1 = d1 <= d2
    cy = np.where(use1, c1[0], c2[0])
    cx = np.where(use1, c1[1], c2[1])
    dy = cy - yy
    dx = cx - xx
    n = np.sqrt(dy ** 2 + dx ** 2) + 1e-6
    flows = np.stack([dy / n, dx / n], axis=-1).astype(np.float32)
    flows[~fg] = 0.0
    return fg, flows, (d1 <= r), (d2 <= r)


def test_follow_flows_converges_to_centers():
    fg, flows, m1, m2 = _two_cell_scene()
    land = np.asarray(follow_flows(jnp.asarray(flows), n_iter=120))
    # a pixel well inside cell 1 lands within a few px of center 1
    y, x = 40, 30
    assert abs(land[y, x, 0] - 48) < 3 and abs(land[y, x, 1] - 40) < 3
    y, x = 56, 90
    assert abs(land[y, x, 0] - 48) < 3 and abs(land[y, x, 1] - 80) < 3


def test_flow_label_separates_touching_cells():
    """CCL sees ONE component (the discs overlap); flow labels see TWO."""
    from imageprocess_tpu.morphology.ccl import label as ccl_label

    fg, flows, m1, m2 = _two_cell_scene()
    assert int(np.asarray(ccl_label(jnp.asarray(fg), connectivity=2,
                                    max_labels=64)).max()) == 1
    lab = np.asarray(flow_label(jnp.asarray(fg), jnp.asarray(flows)))
    ids = sorted(set(lab[fg].tolist()) - {0})
    assert len(ids) == 2, ids
    # each disc's core pixels carry one consistent id
    core1 = lab[44:52, 30:38]
    core2 = lab[44:52, 84:92]
    assert core1.min() == core1.max() != 0
    assert core2.min() == core2.max() != 0
    assert core1[0, 0] != core2[0, 0]
    # the split respects the flow divide: ~each half of the union
    n1 = (lab[fg] == core1[0, 0]).sum()
    n2 = (lab[fg] == core2[0, 0]).sum()
    total = int(fg.sum())
    assert n1 + n2 >= 0.98 * total
    assert 0.4 <= n1 / total <= 0.6


def test_flow_label_kills_stray_fragments():
    """A lone foreground pixel with zero flow lands alone -> below
    min_landings -> no fragment instance."""
    fg, flows, _, _ = _two_cell_scene()
    fg = fg.copy()
    fg[5, 5] = True  # stray speck, zero flow
    lab = np.asarray(flow_label(jnp.asarray(fg), jnp.asarray(flows)))
    assert lab[5, 5] == 0
    assert len(set(lab[lab > 0].tolist())) == 2


def test_unet_inference_flow_vs_ccl_paths(tmp_path):
    """segment_frame_unet runs both instance modes on a synthetic frame and
    the flow path returns at least as many instances."""
    import jax

    from imageprocess_tpu.models.train import TrainConfig, create_train_state
    from imageprocess_tpu.segment.cellseg import segment_frame_unet

    rng = np.random.default_rng(0)
    img = rng.normal(80, 10, (128, 160)).astype(np.float32)
    img[20:60, 20:60] += 900
    img[70:110, 90:130] += 900
    cfg = TrainConfig(features=(8, 16), tile=64)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    for ff in (False, True):  # untrained net: just exercise both paths
        polys = segment_frame_unet(img, state.apply_fn, state.params,
                                   tile=64, overlap=8, min_size_px=10,
                                   flow_follow=ff)
        assert isinstance(polys, list)
