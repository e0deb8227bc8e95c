"""DPT-hybrid-384 in Flax — the reference's flagship model, TPU-native.

Capability match for omnidata_tools/torch/modules/midas/{dpt_depth.py,vit.py,
blocks.py}: a ResNetV2-50 (3,4,9) weight-standardized/GroupNorm stem feeding a
ViT-B/16, with features tapped at resnet stages 0-1 and transformer blocks
8,11 ('vitb_rn50_384' hooks, dpt_depth.py:41-45), project-readout, reassemble
convs, four RefineNet-style fusion blocks and the monocular head.

Design differences from the torch original (deliberate, TPU-first):
- NHWC layout end-to-end; convs hit the MXU directly.
- Activations are returned functionally (no forward hooks).
- align-corners bilinear upsampling is two dense matmuls (layers.resize_bilinear).
- arbitrary input sizes supported by resizing the position embedding, like
  forward_flex (vit.py:119-156), but resolved statically at trace time.

Weight layout is chosen so the public torch checkpoints
(omnidata_dpt_{depth,normal}_v2.ckpt) convert 1:1 — see convert.py.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import EncoderBlock, GroupNormAct, StdConv, resize_bilinear


class BottleneckV2(nn.Module):
    """timm resnetv2.Bottleneck (non-preact): conv1/norm1 -> conv2/norm2 ->
    conv3/norm3(no act) -> +shortcut -> relu. Downsample = 1x1 conv + norm."""

    mid: int
    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        needs_down = x.shape[-1] != self.out or self.stride != 1
        shortcut = x
        if needs_down:
            shortcut = StdConv(self.out, (1, 1), (self.stride, self.stride), use_bias=False, name="downsample_conv")(x)
            shortcut = GroupNormAct(act=False, name="downsample_norm")(shortcut)
        y = StdConv(self.mid, (1, 1), use_bias=False, name="conv1")(x)
        y = GroupNormAct(name="norm1")(y)
        y = StdConv(self.mid, (3, 3), (self.stride, self.stride), use_bias=False, name="conv2")(y)
        y = GroupNormAct(name="norm2")(y)
        y = StdConv(self.out, (1, 1), use_bias=False, name="conv3")(y)
        y = GroupNormAct(act=False, name="norm3")(y)
        return nn.relu(y + shortcut)


class ResNetV2Backbone(nn.Module):
    """Stem + stages (3,4,9); returns (stage0, stage1, stage2) features at
    strides 4/8/16 with 256/512/1024 channels."""

    layers: Sequence[int] = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, (7, 7), (2, 2), use_bias=False, name="stem_conv")(x)
        x = GroupNormAct(name="stem_norm")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        widths = [(64, 256), (128, 512), (256, 1024)]
        for si, (nblocks, (mid, out)) in enumerate(zip(self.layers, widths)):
            for bi in range(nblocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = BottleneckV2(mid, out, stride, name=f"stage{si}_block{bi}")(x)
            feats.append(x)
        return feats


class ProjectReadout(nn.Module):
    """Fuse the cls token into every patch token: concat + Linear + GELU
    (vit.py:36-47, readout='project')."""

    dim: int

    @nn.compact
    def __call__(self, tokens, cls_tok):
        readout = jnp.broadcast_to(cls_tok[:, None, :], tokens.shape)
        x = jnp.concatenate([tokens, readout], -1)
        x = nn.Dense(self.dim, name="project")(x)
        return nn.gelu(x, approximate=False)


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv + skip (blocks.py ResidualConvUnit_custom, bn=False)."""

    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(y)
        return y + x


class FeatureFusion(nn.Module):
    """blocks.py FeatureFusionBlock_custom: optional lateral RCU add, RCU,
    x2 align-corners bilinear upsample, 1x1 out conv."""

    features: int

    @nn.compact
    def __call__(self, x, lateral=None):
        if lateral is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(lateral)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        h, w = x.shape[-3] * 2, x.shape[-2] * 2
        x = resize_bilinear(x, (h, w), align_corners=True)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHybrid(nn.Module):
    """Full DPT-hybrid model. Input NHWC float; output NHWC (num_channels).

    num_channels=1 -> depth head, 3 -> surface normals (dpt_depth.py:87-107).
    """

    num_channels: int = 1
    features: int = 256
    vit_dim: int = 768
    vit_heads: int = 12
    vit_blocks: int = 12
    hooks: Sequence[int] = (8, 11)
    pos_grid: int = 24  # pos embed stored for 384/16 = 24x24 patches
    non_negative: bool = True

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        gh, gw = H // 16, W // 16

        # ---- hybrid backbone -------------------------------------------------
        feats = ResNetV2Backbone(name="backbone")(x)
        layer_1, layer_2 = feats[0], feats[1]  # strides 4, 8
        y = nn.Conv(self.vit_dim, (1, 1), name="patch_proj")(feats[2])  # (B,gh,gw,768)
        tokens = y.reshape(B, gh * gw, self.vit_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.vit_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, self.pos_grid * self.pos_grid + 1, self.vit_dim),
        )
        # forward_flex: bilinear-resize the grid part of the pos embed.
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            tok_pe, grid_pe = pos_embed[:, :1], pos_embed[:, 1:]
            grid_pe = grid_pe.reshape(1, self.pos_grid, self.pos_grid, self.vit_dim)
            grid_pe = jax.image.resize(
                grid_pe, (1, gh, gw, self.vit_dim), method="bilinear"
            ).reshape(1, gh * gw, self.vit_dim)
            pos_embed = jnp.concatenate([tok_pe, grid_pe], 1)

        seq = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, self.vit_dim)), tokens], 1)
        seq = seq + pos_embed

        hooked = {}
        for i in range(self.vit_blocks):
            seq = EncoderBlock(self.vit_dim, self.vit_heads, name=f"block{i}")(seq)
            if i in self.hooks:
                hooked[i] = seq
        # (final LayerNorm 'norm' exists in checkpoints but its output is
        # unused by DPT — the taps are pre-norm; keep the params for parity.)
        _ = nn.LayerNorm(epsilon=1e-6, name="norm")(seq)

        def tokens_to_map(t, name):
            r = ProjectReadout(self.vit_dim, name=f"readout{name}")(t[:, 1:], t[:, 0])
            return r.reshape(B, gh, gw, self.vit_dim)

        layer_3 = tokens_to_map(hooked[self.hooks[0]], "3")
        layer_3 = nn.Conv(self.vit_dim, (1, 1), name="postprocess3_conv")(layer_3)
        layer_4 = tokens_to_map(hooked[self.hooks[1]], "4")
        layer_4 = nn.Conv(self.vit_dim, (1, 1), name="postprocess4_conv")(layer_4)
        layer_4 = nn.Conv(
            self.vit_dim, (3, 3), strides=(2, 2), padding="SAME", name="postprocess4_down"
        )(layer_4)

        # ---- scratch / refinenet decoder ------------------------------------
        f = self.features
        rn = lambda i, t: nn.Conv(f, (3, 3), padding="SAME", use_bias=False, name=f"layer{i}_rn")(t)
        l1, l2, l3, l4 = rn(1, layer_1), rn(2, layer_2), rn(3, layer_3), rn(4, layer_4)

        path4 = FeatureFusion(f, name="refinenet4")(l4)
        path3 = FeatureFusion(f, name="refinenet3")(path4, l3)
        path2 = FeatureFusion(f, name="refinenet2")(path3, l2)
        path1 = FeatureFusion(f, name="refinenet1")(path2, l1)

        # ---- head ------------------------------------------------------------
        y = nn.Conv(f // 2, (3, 3), padding="SAME", name="head_conv1")(path1)
        y = resize_bilinear(y, (y.shape[-3] * 2, y.shape[-2] * 2), align_corners=True)
        y = nn.Conv(32, (3, 3), padding="SAME", name="head_conv2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_channels, (1, 1), name="head_conv3")(y)
        if self.non_negative:
            y = nn.relu(y)
        return y
