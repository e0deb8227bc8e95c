"""MidasNet variants (reference: modules/midas/midas_net.py MidasNet
(ResNeXt101-wsl) and midas_net_custom.py MidasNet_small (efficientnet-lite3)).

Role-equivalent Flax implementations: a compact inverted-residual encoder in
the MidasNet_small slot and the shared FeatureFusion decoder + monocular head
from dpt.py. (The reference's exact torch-hub backbones are not reproduced
weight-for-weight; the shipped omnidata checkpoints are DPT/UNet, which have
exact converters — see convert.py.)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dpt import FeatureFusion
from .layers import resize_bilinear


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 4

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1] * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, name="pw1")(x)
        y = nn.relu(nn.GroupNorm(num_groups=8, name="gn1")(y))
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False, name="dw")(y)
        y = nn.relu(nn.GroupNorm(num_groups=8, name="gn2")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="pw2")(y)
        y = nn.GroupNorm(num_groups=8, name="gn3")(y)
        if self.stride == 1 and x.shape[-1] == self.features:
            y = y + x
        return y


class MidasNetSmall(nn.Module):
    """Lightweight monocular depth net (MidasNet_small role)."""

    features: int = 64
    widths: Sequence[int] = (24, 40, 96, 176)

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        h = nn.Conv(16, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    name="stem")(x)
        h = nn.relu(nn.GroupNorm(num_groups=8, name="stem_gn")(h))
        feats = []
        for i, w in enumerate(self.widths):
            h = InvertedResidual(w, stride=2 if i > 0 else 1, name=f"ir{i}a")(h)
            h = InvertedResidual(w, name=f"ir{i}b")(h)
            feats.append(h)
        f = self.features
        rn = lambda i, t: nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                                  name=f"layer{i}_rn")(t)
        l1, l2, l3, l4 = (rn(i + 1, t) for i, t in enumerate(feats))
        p4 = FeatureFusion(f, name="refinenet4")(l4)
        p3 = FeatureFusion(f, name="refinenet3")(p4, l3)
        p2 = FeatureFusion(f, name="refinenet2")(p3, l2)
        p1 = FeatureFusion(f, name="refinenet1")(p2, l1)
        y = nn.Conv(f // 2, (3, 3), padding="SAME", name="head_conv1")(p1)
        y = resize_bilinear(y, (H, W), align_corners=True)
        y = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="head_conv3")(y)
        return nn.relu(y)
