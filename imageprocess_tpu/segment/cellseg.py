"""Learned full-frame cell segmentation: tiled U-Net inference.

The Cellpose-replacement inference path: frames are normalized (1-99
percentile stretch like Cellpose), cut into overlapping tiles sized for the
network, batched through the jitted forward pass, recomposed with feathered
overlap, thresholded and instance-separated by FLOW FOLLOWING
(segment.flows — the network's trained center-pointing flow head,
integrated on device, splits touching cells exactly like Cellpose's
follow_flows; the device CCL remains as the ``flow_follow=False``
fallback).  Polygons come out via the same cv2 external-contour conversion
as the reference (src/ROI_auto_drawer.py:298-310).
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..morphology.ccl import label, remove_small_objects
from ..morphology.contours import masks_to_polygons
from ..ops.view import stretch_view


@partial(jax.jit, static_argnames=("apply_fn",))
def _forward(apply_fn, params, tiles):
    return apply_fn(params, tiles)


def _forward_tiles(apply_fn, params, tiles: np.ndarray, mesh) -> np.ndarray:
    """Run the jitted forward pass over the tile batch, optionally sharded
    over a 1-D device mesh (the multi-device analog of the reference's
    Cellpose ``batch_size`` GPU batching, ROI_auto_drawer.py:192-203,241):
    the batch axis is laid out across the mesh and GSPMD partitions the
    convolutions per device, params replicated.  Tile outputs are
    device-order-independent, so results are identical to single-device."""
    if mesh is None:
        return np.asarray(_forward(apply_fn, params, jnp.asarray(tiles)))
    from jax.sharding import NamedSharding, PartitionSpec

    n = int(mesh.devices.size)
    t = tiles.shape[0]
    pad = (-t) % n
    if pad:
        tiles = np.concatenate(
            [tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    arr = jax.device_put(
        jnp.asarray(tiles),
        NamedSharding(mesh, PartitionSpec(mesh.axis_names[0])))
    return np.asarray(_forward(apply_fn, params, arr))[:t]


def segment_frame_unet(
    img: np.ndarray,
    apply_fn,
    params,
    tile: int = 256,
    overlap: int = 32,
    prob_threshold: float = 0.5,
    min_size_px: int = 100,
    max_labels: int = 1024,
    min_poly_area: float = 20.0,
    flow_follow: bool = True,
    mesh=None,
) -> List[np.ndarray]:
    """Full frame -> instance polygons via tiled U-Net inference.

    ``mesh``: optional 1-D `jax.sharding.Mesh` — the tile batch is sharded
    across it (results identical to single-device)."""
    H, W = img.shape
    x = np.asarray(
        stretch_view(jnp.asarray(img, jnp.float32), jnp.int32(1000),
                     jnp.int32(99000), jnp.float32(1.0), jnp.int32(0))
    )
    if 2 * overlap >= tile:
        # small checkpoints (config.json tile=64 with the default
        # overlap=32) would give stride<=0: range() then crashes or,
        # worse, covers only corner tiles and interior cells vanish
        overlap = tile // 4
    stride = tile - 2 * overlap
    ys = list(range(0, max(H - tile, 0) + 1, stride)) or [0]
    xs = list(range(0, max(W - tile, 0) + 1, stride)) or [0]
    if ys[-1] + tile < H:
        ys.append(H - tile)
    if xs[-1] + tile < W:
        xs.append(W - tile)

    pad_h = max(0, tile - H)
    pad_w = max(0, tile - W)
    if pad_h or pad_w:
        x = np.pad(x, ((0, pad_h), (0, pad_w)), mode="reflect")

    tiles = np.stack([
        x[y:y + tile, xx:xx + tile] for y in ys for xx in xs
    ])[..., None]
    out = _forward_tiles(apply_fn, params, tiles, mesh)
    prob = 1.0 / (1.0 + np.exp(-out[..., 0]))
    n_ch = out.shape[-1]

    # feathered recomposition: the probability map AND (when present) the
    # two flow channels blend with the same per-tile weights
    acc = np.zeros((H + pad_h, W + pad_w, max(1, n_ch)), np.float32)
    wacc = np.zeros((H + pad_h, W + pad_w), np.float32)
    wy = np.minimum(np.arange(tile) + 1, np.arange(tile)[::-1] + 1)
    wtile = np.minimum.outer(wy, wy).astype(np.float32)
    k = 0
    for y in ys:
        for xx in xs:
            acc[y:y + tile, xx:xx + tile, 0] += prob[k] * wtile
            for c in range(1, n_ch):
                acc[y:y + tile, xx:xx + tile, c] += out[k, ..., c] * wtile
            wacc[y:y + tile, xx:xx + tile] += wtile
            k += 1
    full = acc / np.maximum(wacc, 1e-6)[..., None]
    prob_full = full[:H, :W, 0]

    bw = jnp.asarray(prob_full > prob_threshold)
    if min_size_px > 0:
        bw = remove_small_objects(bw, min_size_px, connectivity=1)
    if flow_follow and n_ch >= 3:
        from .flows import flow_label

        labels, over = flow_label(bw, jnp.asarray(full[:H, :W, 1:3]),
                                  max_labels=max_labels, with_overflow=True)
    else:
        labels, over = label(bw, connectivity=2, max_labels=max_labels,
                             with_overflow=True)
    if bool(over):
        raise ValueError(
            f"component count exceeded max_labels={max_labels} — labels "
            "would alias; raise AutoSegConfig.max_labels")
    return masks_to_polygons(np.asarray(labels), min_poly_area)
