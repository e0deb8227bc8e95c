"""HRNet (High-Resolution Network) for semantic segmentation — faithful
Flax port of the reference architecture (paper_code/models/seg_hrnet.py:1-590,
"High-Resolution Representations for Labeling Pixels and Regions").

Structure (seg_hrnet.py:271-345):
- stem: two stride-2 3x3 convs (3->64->64), BN+ReLU
- stage1: Bottleneck x num_blocks at 64 channels (out 256)
- stages 2-4: parallel branches at 1/4 .. 1/32 resolution; each stage runs
  NUM_MODULES HighResolutionModules of BasicBlocks followed by full
  cross-resolution fusion (1x1 conv + bilinear up for coarse->fine, chains
  of stride-2 3x3 convs for fine->coarse, sum + ReLU; seg_hrnet.py:189-266)
- transitions insert new coarser branches from the previous stage's last
  branch (seg_hrnet.py:347-384)
- head: upsample all branches to 1/4, concat, 1x1 conv + BN + ReLU + 1x1 to
  n_classes, bilinear (align_corners=True) to the input size

Width variants (hrnet_w{18,32,48}.yml): NUM_BLOCKS=2 per branch,
NUM_MODULES=(1,1,3,2). Weight converter: convert_hrnet (models/convert.py
style) gives full numeric parity with the torch reference (tests).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import resize_bilinear

BN_MOMENTUM = 0.01


class _ConvBN(nn.Module):
    """conv (no bias) + BN, torch-compatible names (conv/bn)."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        x = nn.Conv(self.features, (k, k), (self.stride, self.stride),
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=1 - BN_MOMENTUM,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (seg_hrnet.py:37-70), expansion 1."""
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        r = x
        y = _ConvBN(self.planes, 3, self.stride, relu=True, name="c1")(x)
        y = _ConvBN(self.planes, 3, 1, relu=False, name="c2")(y)
        if self.downsample:
            r = _ConvBN(self.planes, 1, self.stride, relu=False, name="ds")(x)
        return nn.relu(y + r)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) residual block (seg_hrnet.py:73-115)."""
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        r = x
        y = _ConvBN(self.planes, 1, 1, relu=True, name="c1")(x)
        y = _ConvBN(self.planes, 3, self.stride, relu=True, name="c2")(y)
        y = _ConvBN(self.planes * 4, 1, 1, relu=False, name="c3")(y)
        if self.downsample:
            r = _ConvBN(self.planes * 4, 1, self.stride, relu=False,
                        name="ds")(x)
        return nn.relu(y + r)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlocks + full fusion
    (seg_hrnet.py:118-266)."""
    channels: Sequence[int]   # per-branch widths (expansion applied)
    num_blocks: int

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for k in range(self.num_blocks):
                x = BasicBlock(self.channels[i], name=f"b{i}_{k}")(x)
            ys.append(x)
        if n == 1:
            return ys
        fused = []
        for i in range(n):
            acc = ys[i]
            for j in range(n):
                if j == i:
                    continue
                if j > i:  # coarser -> 1x1 conv + bilinear up
                    h = _ConvBN(self.channels[i], 1, 1, relu=False,
                                name=f"f{i}_{j}")(ys[j])
                    h = resize_bilinear(h, acc.shape[1:3],
                                        align_corners=False)
                else:  # finer -> chain of stride-2 3x3 convs
                    h = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        h = _ConvBN(
                            self.channels[i] if last else self.channels[j],
                            3, 2, relu=not last, name=f"f{i}_{j}_{k}")(h)
                acc = acc + h
            fused.append(nn.relu(acc))
        return fused


# (num_modules, num_blocks, channels) per stage, per variant;
# stage1 is (num_blocks, channels) with Bottleneck
HRNET_CONFIGS = {
    "w18": ((2, 64), (1, 2, (18, 36)), (3, 2, (18, 36, 72)),
            (2, 2, (18, 36, 72, 144))),
    "w32": ((2, 64), (1, 2, (32, 64)), (3, 2, (32, 64, 128)),
            (2, 2, (32, 64, 128, 256))),
    "w48": ((2, 64), (1, 2, (48, 96)), (3, 2, (48, 96, 192)),
            (2, 2, (48, 96, 192, 384))),
}


class HRNet(nn.Module):
    """Full segmentation HRNet (HighResolutionNet, seg_hrnet.py:271-502).

    NHWC in/out; input spatial size must satisfy (s-1) % 8 == 0 like the
    reference's assert (seg_hrnet.py:446)."""
    out_channels: int
    variant: str = "w18"

    @nn.compact
    def __call__(self, x):
        cfg = HRNET_CONFIGS[self.variant]
        H, W = x.shape[1], x.shape[2]
        x = _ConvBN(64, 3, 2, relu=True, name="stem1")(x)
        x = _ConvBN(64, 3, 2, relu=True, name="stem2")(x)

        # stage 1: Bottlenecks at 64 (out 256)
        n_blocks1, ch1 = cfg[0]
        for k in range(n_blocks1):
            x = Bottleneck(ch1, downsample=(k == 0), name=f"layer1_{k}")(x)
        prev_ch = [ch1 * 4]
        xs = [x]

        for s, (n_modules, n_blocks, channels) in enumerate(cfg[1:], start=2):
            # transition (seg_hrnet.py:347-384): existing branches get a 3x3
            # conv when widths change; each NEW branch downsamples from the
            # previous stage's LAST branch
            nxt = []
            for i, c in enumerate(channels):
                if i < len(prev_ch):
                    if prev_ch[i] != c:
                        nxt.append(_ConvBN(c, 3, 1, relu=True,
                                           name=f"t{s}_{i}")(xs[i]))
                    else:
                        nxt.append(xs[i])
                else:
                    h = xs[-1]
                    for j in range(i + 1 - len(prev_ch)):
                        out_c = c if j == i - len(prev_ch) else prev_ch[-1]
                        h = _ConvBN(out_c, 3, 2, relu=True,
                                    name=f"t{s}_{i}_{j}")(h)
                    nxt.append(h)
            xs = nxt
            for m in range(n_modules):
                xs = HRModule(channels, n_blocks, name=f"s{s}_m{m}")(xs)
            prev_ch = list(channels)

        hw = xs[0].shape[1:3]
        cat = jnp.concatenate(
            [xs[0]] + [resize_bilinear(h, hw, align_corners=False)
                       for h in xs[1:]], -1,
        )
        y = nn.Conv(cat.shape[-1], (1, 1), name="head1")(cat)
        y = nn.BatchNorm(use_running_average=True, momentum=1 - BN_MOMENTUM,
                         epsilon=1e-5, name="head_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), name="head2")(y)
        return resize_bilinear(y, (H, W), align_corners=True)


def hrnet_mapping(variant: str = "w18"):
    """(flax_path, torch_key, kind) triples for models.convert._convert —
    full torch seg_hrnet state dict -> HRNet Flax variables."""
    cfg = HRNET_CONFIGS[variant]

    def cbn(flax_prefix, torch_conv, torch_bn):
        yield (f"{flax_prefix}/conv", torch_conv, "conv_nobias")
        yield (f"{flax_prefix}/bn", torch_bn, "bn")

    yield from cbn("stem1", "conv1", "bn1")
    yield from cbn("stem2", "conv2", "bn2")

    n_blocks1, _ = cfg[0]
    for k in range(n_blocks1):
        base = f"layer1.{k}"
        for c in (1, 2, 3):
            yield from cbn(f"layer1_{k}/c{c}", f"{base}.conv{c}",
                           f"{base}.bn{c}")
        if k == 0:
            yield from cbn(f"layer1_{k}/ds", f"{base}.downsample.0",
                           f"{base}.downsample.1")

    prev_ch = [cfg[0][1] * 4]
    for s, (n_modules, n_blocks, channels) in enumerate(cfg[1:], start=2):
        t = f"transition{s - 1}"
        for i, c in enumerate(channels):
            if i < len(prev_ch):
                if prev_ch[i] != c:
                    yield from cbn(f"t{s}_{i}", f"{t}.{i}.0", f"{t}.{i}.1")
            else:
                for j in range(i + 1 - len(prev_ch)):
                    yield from cbn(f"t{s}_{i}_{j}", f"{t}.{i}.{j}.0",
                                   f"{t}.{i}.{j}.1")
        for m in range(n_modules):
            mod = f"stage{s}.{m}"
            for i in range(len(channels)):
                for k in range(n_blocks):
                    b = f"{mod}.branches.{i}.{k}"
                    yield from cbn(f"s{s}_m{m}/b{i}_{k}/c1", f"{b}.conv1",
                                   f"{b}.bn1")
                    yield from cbn(f"s{s}_m{m}/b{i}_{k}/c2", f"{b}.conv2",
                                   f"{b}.bn2")
            if len(channels) > 1:
                for i in range(len(channels)):
                    for j in range(len(channels)):
                        if j > i:
                            f = f"{mod}.fuse_layers.{i}.{j}"
                            yield from cbn(f"s{s}_m{m}/f{i}_{j}", f"{f}.0",
                                           f"{f}.1")
                        elif j < i:
                            for k in range(i - j):
                                f = f"{mod}.fuse_layers.{i}.{j}.{k}"
                                yield from cbn(f"s{s}_m{m}/f{i}_{j}_{k}",
                                               f"{f}.0", f"{f}.1")
        prev_ch = list(channels)

    yield ("head1", "last_layer.0", "conv")
    yield ("head_bn", "last_layer.1", "bn")
    yield ("head2", "last_layer.3", "conv")


def convert_hrnet(state_dict: dict, variant: str = "w18") -> dict:
    """torch seg_hrnet state dict -> HRNet Flax variables."""
    from .convert import _convert, strip_prefix

    return _convert(hrnet_mapping(variant), strip_prefix(state_dict))
