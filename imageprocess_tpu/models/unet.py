"""U-Net for fluorescence cell segmentation (flax.linen).

TPU-first choices: NHWC layout, channel counts in multiples of 32 so conv
GEMMs tile the 128x128 MXU, GroupNorm (batch-size independent, no cross-
device sync), bfloat16 compute with float32 params, and a
``cellprob`` + 2-channel spatial-gradient head like Cellpose's output
parameterization (masks are recovered by thresholding cellprob and CCL —
morphology.ccl — rather than flow integration).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.GroupNorm(num_groups=min(8, self.features),
                             dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Encoder-decoder with skip connections; returns (B, H, W, 3):
    channel 0 = cell probability logit, channels 1..2 = y/x gradient maps.
    H and W must be divisible by 2**len(features)."""

    features: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = ConvBlock(f, self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(self.features[-1] * 2, self.dtype)(x)
        for f, skip in zip(reversed(self.features), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(f, self.dtype)(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)
