"""The full MiDaS v2.1 architectures, faithful to the reference:

- MidasNet: ResNeXt101-32x8d (WSL) backbone + plain FeatureFusion decoder
  (modules/midas/midas_net.py:12-77; blocks.py _make_pretrained_resnext101_wsl
  taps layer1..layer4 with scratch channels [256,512,1024,2048]).
- MidasNetSmallTF: tf_efficientnet_lite3 backbone + custom fusion decoder
  with channel expansion (midas_net_custom.py:12-128; taps after stages
  2/3/5/7 with channels [32,48,136,384]).

Flax/NHWC; BatchNorm runs in inference mode by default (pass train=True and
mutable=['batch_stats'] to train). Param names mirror the torch modules so a
checkpoint converter is a flat name map.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_bilinear


# ---------------------------------------------------------------------------
# shared decoder blocks (plain MiDaS variants, blocks.py FeatureFusionBlock)
# ---------------------------------------------------------------------------

class ResidualConvUnit(nn.Module):
    """out = x + conv2(relu(conv1(relu(x)))) (blocks.py ResidualConvUnit)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """Plain fusion: add skip through RCU1, refine with RCU2, upsample x2
    (align_corners=True bilinear) — blocks.py FeatureFusionBlock."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        h, w = x.shape[1] * 2, x.shape[2] * 2
        return resize_bilinear(x, (h, w), align_corners=True)


class FeatureFusionBlockCustom(nn.Module):
    """MidasNet_small's fusion (blocks.py FeatureFusionBlock_custom,
    deconv=False bn=False): RCU_custom units + out_conv 1x1; `expand` halves
    the channel count on output."""

    features: int
    expand: bool = False

    @nn.compact
    def __call__(self, x, skip=None):
        out_features = self.features // 2 if self.expand else self.features

        def rcu(name, t):
            y = nn.relu(t)
            y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=True,
                        name=f"{name}_conv1")(y)
            y = nn.relu(y)
            y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=True,
                        name=f"{name}_conv2")(y)
            return t + y

        if skip is not None:
            x = x + rcu("resConfUnit1", skip)
        x = rcu("resConfUnit2", x)
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = resize_bilinear(x, (h, w), align_corners=True)
        return nn.Conv(out_features, (1, 1), name="out_conv")(x)


# ---------------------------------------------------------------------------
# ResNeXt101 32x8d
# ---------------------------------------------------------------------------

class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class ResNeXtBottleneck(nn.Module):
    """torchvision Bottleneck with groups=32, base_width=8."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 8
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        bn = lambda name, t: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name)(t)
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn("bn1", y))
        # torchvision uses STATIC padding=1 (not TF-SAME): explicit (1,1)
        # keeps stride-2 window positions identical to torch
        y = nn.Conv(width, (3, 3), (self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups, use_bias=False,
                    name="conv2")(y)
        y = nn.relu(bn("bn2", y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = bn("bn3", y)
        if self.downsample:
            x = nn.Conv(out_ch, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="downsample_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="downsample_bn")(x)
        return nn.relu(x + y)


class ResNeXt101Backbone(nn.Module):
    """resnext101_32x8d: layers (3,4,23,3); returns the 4 stage features
    (strides 4/8/16/32, channels 256/512/1024/2048)."""

    layers: Sequence[int] = (3, 4, 23, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), (2, 2), padding="VALID")
        feats = []
        planes = 64
        for si, n_blocks in enumerate(self.layers):
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                y = ResNeXtBottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{si + 1}_block{bi}",
                )(y, train)
            feats.append(y)
            planes *= 2
        return feats


class MidasNet(nn.Module):
    """MiDaS v2.1 large (midas_net.py): ResNeXt101-wsl + plain fusion,
    head conv(128)->x2 up->conv(32)->relu->conv(1)->relu. Returns (B,H,W)."""

    features: int = 256
    non_negative: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1], x.shape[2]
        l1, l2, l3, l4 = ResNeXt101Backbone(name="pretrained")(x, train)
        f = self.features
        rn = lambda i, t: nn.Conv(f, (3, 3), padding="SAME", use_bias=False,
                                  name=f"layer{i}_rn")(t)
        p4 = FeatureFusionBlock(f, name="refinenet4")(rn(4, l4))
        p3 = FeatureFusionBlock(f, name="refinenet3")(p4, rn(3, l3))
        p2 = FeatureFusionBlock(f, name="refinenet2")(p3, rn(2, l2))
        p1 = FeatureFusionBlock(f, name="refinenet1")(p2, rn(1, l1))
        y = nn.Conv(128, (3, 3), padding="SAME", name="output_conv1")(p1)
        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                            align_corners=False)
        y = nn.Conv(32, (3, 3), padding="SAME", name="output_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="output_conv3")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y[..., 0]


# ---------------------------------------------------------------------------
# tf_efficientnet_lite3
# ---------------------------------------------------------------------------

def _round_channels(c: float, multiplier: float = 1.2, divisor: int = 8):
    c *= multiplier
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


# EfficientNet-B0 stage spec: (repeats, kernel, stride, expand, channels)
_EFFNET_STAGES = [
    (1, 3, 1, 1, 16),
    (2, 3, 2, 6, 24),
    (2, 5, 2, 6, 40),
    (3, 3, 2, 6, 80),
    (3, 5, 1, 6, 112),
    (4, 5, 2, 6, 192),
    (1, 3, 1, 6, 320),
]


def lite3_stage_channels():
    """tf_efficientnet_lite3 (width 1.2, depth 1.4; lite: first/last stage
    repeats NOT depth-scaled, stem fixed at 32, no SE, relu6)."""
    out = []
    for i, (r, k, s, e, c) in enumerate(_EFFNET_STAGES):
        reps = r if i in (0, len(_EFFNET_STAGES) - 1) else int(math.ceil(r * 1.4))
        out.append((reps, k, s, e, _round_channels(c)))
    return out


class MBConvLite(nn.Module):
    """EfficientNet-lite MBConv: no SE, relu6."""

    out_ch: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name, t: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            name=name)(t)
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False,
                        name="conv_pw")(y)
            y = nn.relu6(bn("bn1", y))
        mid = y.shape[-1]
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    (self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False, name="conv_dw")(y)
        y = nn.relu6(bn("bn2", y))
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="conv_pwl")(y)
        y = bn("bn3", y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class EfficientNetLite3Backbone(nn.Module):
    """Returns the MidasNet_small taps: after stage indices 1, 2, 4, 6
    (blocks.py _make_efficientnet_backbone layer1..layer4) with channels
    [32, 48, 136, 384]."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(32, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    name="conv_stem")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn1")(y)
        y = nn.relu6(y)
        feats = []
        for si, (reps, k, s, e, c) in enumerate(lite3_stage_channels()):
            for bi in range(reps):
                y = MBConvLite(c, k, s if bi == 0 else 1, e,
                               name=f"blocks_{si}_{bi}")(y, train)
            if si in (1, 2, 4, 6):
                feats.append(y)
        return feats


class MidasNetSmallTF(nn.Module):
    """MiDaS v2.1 small (midas_net_custom.py, blocks={'expand': True}):
    efficientnet-lite3 taps -> expanding scratch [64,128,256,512] -> custom
    fusion (each halving channels) -> grouped head. Returns (B,H,W)."""

    features: int = 64
    non_negative: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1], x.shape[2]
        l1, l2, l3, l4 = EfficientNetLite3Backbone(name="pretrained")(x, train)
        f = self.features
        fs = (f, f * 2, f * 4, f * 8)
        rn = lambda i, ch, t: nn.Conv(ch, (3, 3), padding="SAME",
                                      use_bias=False, name=f"layer{i}_rn")(t)
        p4 = FeatureFusionBlockCustom(fs[3], expand=True, name="refinenet4")(
            rn(4, fs[3], l4))
        p3 = FeatureFusionBlockCustom(fs[2], expand=True, name="refinenet3")(
            p4, rn(3, fs[2], l3))
        p2 = FeatureFusionBlockCustom(fs[1], expand=True, name="refinenet2")(
            p3, rn(2, fs[1], l2))
        p1 = FeatureFusionBlockCustom(fs[0], expand=False, name="refinenet1")(
            p2, rn(1, fs[0], l1))
        y = nn.Conv(f // 2, (3, 3), padding="SAME", name="output_conv1")(p1)
        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                            align_corners=False)
        y = nn.Conv(32, (3, 3), padding="SAME", name="output_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(1, (1, 1), name="output_conv3")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y[..., 0]
