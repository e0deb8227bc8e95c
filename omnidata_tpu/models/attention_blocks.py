"""Channel-attention blocks (reference: modules/channel_attention.py — ECA,
RCAN channel attention, CBAM; kept for capability parity) as Flax modules,
NHWC."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ECA(nn.Module):
    """Efficient Channel Attention: GAP -> 1D conv over channels -> sigmoid."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2))  # (B,C)
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, 1, 1))
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            gap[:, :, None], k, (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :, 0]
        w = jax.nn.sigmoid(y)[:, None, None, :]
        return x * w


class ChannelAttention(nn.Module):
    """RCAN-style squeeze-excite: GAP -> bottleneck MLP -> sigmoid."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gap = jnp.mean(x, axis=(1, 2))
        h = nn.Dense(max(C // self.reduction, 1), name="fc1")(gap)
        h = nn.relu(h)
        h = nn.Dense(C, name="fc2")(h)
        return x * jax.nn.sigmoid(h)[:, None, None, :]


class CBAM(nn.Module):
    """Convolutional Block Attention: channel (avg+max MLP) then spatial."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # ONE shared MLP for both pooling branches (the CBAM paper and the
        # reference channel_attention.py share fc1/fc2)
        fc1 = nn.Dense(max(C // self.reduction, 1), name="fc1")
        fc2 = nn.Dense(C, name="fc2")
        mlp = lambda v: fc2(nn.relu(fc1(v)))
        ca = jax.nn.sigmoid(
            mlp(jnp.mean(x, (1, 2))) + mlp(jnp.max(x, (1, 2)))
        )[:, None, None, :]
        x = x * ca
        sp = jnp.concatenate(
            [jnp.mean(x, -1, keepdims=True), jnp.max(x, -1, keepdims=True)], -1
        )
        sa = nn.Conv(1, (7, 7), padding="SAME", name="spatial")(sp)
        return x * jax.nn.sigmoid(sa)
