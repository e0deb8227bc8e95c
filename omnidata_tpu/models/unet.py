"""UNet (6-down/6-up, GroupNorm(8)) in Flax — the reference's v1
surface-normal model (omnidata_tools/torch/modules/unet.py:8-110).

NHWC layout; bilinear (half-pixel) x2 upsampling like nn.Upsample(align_corners=False).
"""
from __future__ import annotations

import jax
from flax import linen as nn
import jax.numpy as jnp

from .layers import resize_bilinear


class DownBlock(nn.Module):
    features: int
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        for i in (1, 2, 3):
            x = nn.Conv(self.features, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        x = resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=False)
        x = jnp.concatenate([x, skip], -1)
        for i in (1, 2, 3):
            x = nn.Conv(self.features, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """final_activation: None (default, like the reference UNet), 'relu'
    (UNetRelu variant) or 'sigmoid' (v1 normal demo output convention).

    remat: rematerialize each down/up block on the backward pass
    (jax.checkpoint). The reference trains normals at batch 16 @ 512²
    (config/normal.yml) — fwd+bwd activations for that config need ~16.1 GB,
    just past one v5e chip's 15.75 GB HBM; per-block remat trades the
    block-internal conv activations for recompute and fits with room to
    spare. Parameter names/tree are unchanged (nn.remat is a lifted
    transform), so checkpoints are interchangeable with the plain model."""

    out_channels: int = 3
    downsample: int = 6
    final_activation: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        Down = nn.remat(DownBlock) if self.remat else DownBlock
        Up = nn.remat(UpBlock) if self.remat else UpBlock
        x = Down(16, pool=False, name="down1")(x)
        skips = [x]
        for i in range(self.downsample):
            x = Down(2 ** (5 + i), name=f"down_blocks{i}")(x)
            skips.append(x)

        for i in (1, 2, 3):
            x = nn.Conv(x.shape[-1], (3, 3), padding="SAME", name=f"mid_conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name=f"mid_bn{i}")(x)
            x = nn.relu(x)

        for i in reversed(range(self.downsample)):
            x = Up(2 ** (4 + i), name=f"up_blocks{i}")(x, skips[i])

        x = nn.Conv(16, (3, 3), padding="SAME", name="last_conv1")(x)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="last_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), name="last_conv2")(x)
        if self.final_activation == "relu":
            x = nn.relu(x)
        elif self.final_activation == "sigmoid":
            x = nn.sigmoid(x)
        return x
