"""Learned full-frame cell segmentation: tiled U-Net inference.

The Cellpose-replacement inference path, ONE fused jitted device program
per frame geometry: normalize (1-99 percentile stretch like Cellpose),
cut into overlapping tiles sized for the network, run the forward pass
over the tile batch, recompose with feathered overlap, threshold, and
instance-separate by FLOW FOLLOWING (segment.flows — the network's
trained center-pointing flow head, integrated on device by
scaling-and-squaring, splits touching cells exactly like Cellpose's
follow_flows; the device CCL remains as the ``flow_follow=False``
fallback).  Only the raw frame goes up and the final int32 label map
comes back — no tile stacks or probability maps cross the host link
(the unfused path shipped ~90 MB/frame over the TPU tunnel; this ships
~19 MB).  Polygons come out via the same cv2 external-contour conversion
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


@partial(jax.jit, static_argnames=(
    "apply_fn", "ys", "xs", "tile", "pad_h", "pad_w", "prob_threshold",
    "min_size_px", "max_labels", "flow_follow", "shard",
))
def _seg_fused(
    apply_fn,
    params,
    img: jnp.ndarray,           # (H, W) float32 raw frame
    *,
    ys: tuple,
    xs: tuple,
    tile: int,
    pad_h: int,
    pad_w: int,
    prob_threshold: float,
    min_size_px: int,
    max_labels: int,
    flow_follow: bool,
    shard=None,                 # optional NamedSharding for the tile batch
):
    """Frame -> (instance labels, overflow flag), entirely on device."""
    x = stretch_view(img, jnp.int32(1000), jnp.int32(99000),
                     jnp.float32(1.0), jnp.int32(0))
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, pad_h), (0, pad_w)), mode="reflect")
    tiles = jnp.stack([
        x[y:y + tile, x0:x0 + tile] for y in ys for x0 in xs
    ])[..., None]
    t = tiles.shape[0]
    if shard is not None:
        # lay the tile batch across the mesh (the multi-device analog of
        # the reference's Cellpose batch_size GPU batching,
        # ROI_auto_drawer.py:192-203,241); per-tile math is batch-
        # independent, so results are identical to single-device
        n = int(shard.mesh.devices.size)
        pad_b = (-t) % n
        if pad_b:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad_b,) + tiles.shape[1:], tiles.dtype)])
        tiles = jax.lax.with_sharding_constraint(tiles, shard)
    out = apply_fn(params, tiles)[:t]
    prob = jax.nn.sigmoid(out[..., 0])
    n_ch = out.shape[-1]

    # feathered recomposition: the probability map AND (when present) the
    # two flow channels blend with the same per-tile weights
    wy = jnp.minimum(jnp.arange(tile) + 1, jnp.arange(tile)[::-1] + 1)
    wtile = jnp.minimum(wy[:, None], wy[None, :]).astype(jnp.float32)
    H, W = img.shape
    acc = jnp.zeros((H + pad_h, W + pad_w, max(1, n_ch)), jnp.float32)
    wacc = jnp.zeros((H + pad_h, W + pad_w), jnp.float32)
    blend = jnp.concatenate([prob[..., None], out[..., 1:]], -1) \
        * wtile[None, :, :, None]
    k = 0
    for y in ys:
        for x0 in xs:
            acc = acc.at[y:y + tile, x0:x0 + tile, :].add(blend[k])
            wacc = wacc.at[y:y + tile, x0:x0 + tile].add(wtile)
            k += 1
    full = acc / jnp.maximum(wacc, 1e-6)[..., None]
    prob_full = full[:H, :W, 0]

    bw = prob_full > prob_threshold
    if min_size_px > 0:
        bw = remove_small_objects(bw, min_size_px, connectivity=1)
    if flow_follow and n_ch >= 3:
        from .flows import flow_label

        return flow_label(bw, full[:H, :W, 1:3], max_labels=max_labels,
                          with_overflow=True)
    return label(bw, connectivity=2, max_labels=max_labels,
                 with_overflow=True)


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

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    labels, over = _seg_fused(
        apply_fn, params, jnp.asarray(img, jnp.float32),
        ys=tuple(ys), xs=tuple(xs), tile=tile,
        pad_h=max(0, tile - H), pad_w=max(0, tile - W),
        prob_threshold=float(prob_threshold), min_size_px=int(min_size_px),
        max_labels=int(max_labels), flow_follow=bool(flow_follow),
        shard=shard,
    )
    if bool(over):
        raise ValueError(
            f"component count exceeded max_labels={max_labels} — downstream "
            "per-label buffers are sized by it; raise AutoSegConfig.max_labels")
    return masks_to_polygons(np.asarray(labels), min_poly_area)
