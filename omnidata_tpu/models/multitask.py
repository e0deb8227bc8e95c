"""Multi-task architectures — capability match for the reference's paper code
(paper_code/models/: multi_task_model.py shared-encoder/per-head, MTAN
attention variant (mtan.py:49), PADNet intermediate-prediction distillation
(padnet.py:86), cross-stitch soft sharing (cross_stitch.py:57)), rebuilt as
Flax modules over a ResNet-ish encoder.

These cover the paper repo's training configurations: a shared backbone with
per-task decoders, optional task-attention (MTAN-style per-task gated
features), PADNet-style auxiliary predictions refined by a second stage, and
cross-stitch units mixing per-task towers.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_bilinear


class ConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = nn.GroupNorm(num_groups=8, name="gn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(y)
        y = nn.GroupNorm(num_groups=8, name="gn2")(y)
        if x.shape[-1] != self.features or self.stride != 1:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=False, name="proj")(x)
        return nn.relu(y + x)


class Encoder(nn.Module):
    """4-stage residual encoder (the resnet18-dilated role of
    multi_task_model.py get_backbone)."""

    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.widths[0], (7, 7), (2, 2), padding="SAME",
                    use_bias=False, name="stem")(x)
        x = nn.GroupNorm(num_groups=8, name="stem_gn")(x)
        x = nn.relu(x)
        feats = []
        for i, w in enumerate(self.widths):
            x = ConvBlock(w, stride=1 if i == 0 else 2, name=f"stage{i}_0")(x)
            x = ConvBlock(w, name=f"stage{i}_1")(x)
            feats.append(x)
        return feats


class ASPPHead(nn.Module):
    """DeepLab-style head (multi_task_model.py get_head 'deeplab')."""

    out_channels: int
    features: int = 256

    @nn.compact
    def __call__(self, x, out_hw):
        branches = [nn.Conv(self.features, (1, 1), name="b0")(x)]
        for i, rate in enumerate((6, 12, 18)):
            branches.append(
                nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_dilation=(rate, rate), name=f"b{i+1}")(x)
            )
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = nn.Conv(self.features, (1, 1), name="gap")(gap)
        gap = jnp.broadcast_to(gap, x.shape[:-1] + (self.features,))
        y = jnp.concatenate(branches + [gap], -1)
        y = nn.Conv(self.features, (1, 1), name="proj")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), name="out")(y)
        return resize_bilinear(y, out_hw, align_corners=False)


class MultiTaskModel(nn.Module):
    """Shared encoder + per-task ASPP heads (multi_task_model.py:18-110)."""

    tasks: dict  # name -> out_channels

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        feats = Encoder(name="backbone")(x)
        top = feats[-1]
        return {
            t: ASPPHead(c, name=f"head_{t}")(top, (H, W))
            for t, c in self.tasks.items()
        }


class MTAN(nn.Module):
    """Multi-Task Attention Network: shared encoder + per-task attention
    masks gating the shared features at each stage (mtan.py:49)."""

    tasks: dict

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        feats = Encoder(name="backbone")(x)
        outs = {}
        for t, c in self.tasks.items():
            a = None
            for i, f in enumerate(feats):
                g = f if a is None else jnp.concatenate(
                    [f, resize_bilinear(a, f.shape[1:3])], -1
                )
                att = nn.Conv(f.shape[-1], (1, 1), name=f"att_{t}_{i}a")(g)
                att = nn.relu(att)
                att = nn.Conv(f.shape[-1], (1, 1), name=f"att_{t}_{i}b")(att)
                att = nn.sigmoid(att)
                a = att * f
            outs[t] = ASPPHead(c, name=f"head_{t}")(a, (H, W))
        return outs


class PADNet(nn.Module):
    """Prediction-and-distillation: auxiliary predictions for every task at
    1/4 scale, re-encoded and fused into final per-task heads (padnet.py:86)."""

    tasks: dict
    mid_features: int = 128

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        feats = Encoder(name="backbone")(x)
        top = feats[-1]
        aux, msg = {}, {}
        for t, c in self.tasks.items():
            h = nn.Conv(self.mid_features, (3, 3), padding="SAME",
                        name=f"aux_{t}_conv")(top)
            h = nn.relu(h)
            aux[t] = nn.Conv(c, (1, 1), name=f"aux_{t}_out")(h)
            msg[t] = nn.Conv(self.mid_features, (3, 3), padding="SAME",
                             name=f"msg_{t}")(h)
        fused = jnp.concatenate([msg[t] for t in self.tasks], -1)
        outs = {}
        for t, c in self.tasks.items():
            h = nn.Conv(self.mid_features, (3, 3), padding="SAME",
                        name=f"dist_{t}")(jnp.concatenate([msg[t], fused], -1))
            h = nn.relu(h)
            y = nn.Conv(c, (1, 1), name=f"final_{t}")(h)
            outs[t] = resize_bilinear(y, (H, W), align_corners=False)
        outs["aux"] = {
            t: resize_bilinear(a, (H, W), align_corners=False) for t, a in aux.items()
        }
        return outs


class CrossStitch(nn.Module):
    """Cross-stitch units mixing per-task towers after every stage
    (cross_stitch.py:57): y_t = sum_s alpha[t,s] * x_s with learned alpha."""

    tasks: dict

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        names = list(self.tasks)
        T = len(names)
        widths = (64, 128, 256, 512)
        feats = {}
        for t in names:
            h = nn.Conv(widths[0], (7, 7), (2, 2), padding="SAME",
                        use_bias=False, name=f"stem_{t}")(x)
            h = nn.relu(nn.GroupNorm(num_groups=8, name=f"stem_gn_{t}")(h))
            feats[t] = h
        for i, w in enumerate(widths):
            for t in names:
                feats[t] = ConvBlock(w, stride=1 if i == 0 else 2,
                                     name=f"stage{i}_{t}")(feats[t])
            alpha = self.param(
                f"stitch{i}",
                lambda k, s: jnp.eye(T) * 0.9 + jnp.full((T, T), 0.1 / T),
                (T, T),
            )
            stacked = jnp.stack([feats[t] for t in names], 0)  # (T,B,H,W,C)
            mixed = jnp.einsum("ts,sbhwc->tbhwc", alpha, stacked)
            for ti, t in enumerate(names):
                feats[t] = mixed[ti]
        return {
            t: ASPPHead(c, name=f"head_{t}")(feats[t], (H, W))
            for t, c in self.tasks.items()
        }


def grad_norm_weights(losses: dict, grads_norm: dict, alpha: float = 1.5,
                      initial_losses: dict | None = None) -> dict:
    """GradNorm-style loss balancing (paper_code/losses/loss_balancing.py:3):
    weights pushing per-task gradient norms toward a common scale adjusted
    by relative training rates. Functional single-step form."""
    import numpy as np

    tasks = list(losses)
    g = jnp.asarray([grads_norm[t] for t in tasks])
    mean_g = jnp.mean(g)
    if initial_losses:
        r = jnp.asarray([losses[t] / max(initial_losses[t], 1e-8) for t in tasks])
        r = r / jnp.mean(r)
    else:
        r = jnp.ones(len(tasks))
    target = mean_g * r**alpha
    w = target / jnp.maximum(g, 1e-8)
    w = w * len(tasks) / jnp.sum(w)
    return {t: w[i] for i, t in enumerate(tasks)}


class HRNetLite(nn.Module):
    """HRNet-style multi-resolution network (paper_code/models/seg_hrnet.py
    role): parallel high/mid/low-resolution branches with repeated
    cross-resolution fusion, concat-upsampled head. Compact width
    configuration (the reference uses w18/w32/w48 variants)."""

    out_channels: int
    widths: Sequence[int] = (32, 64, 128)
    n_stages: int = 3

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        x = nn.Conv(self.widths[0], (3, 3), (2, 2), padding="SAME", name="stem1")(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, name="stem1_gn")(x))
        x = nn.Conv(self.widths[0], (3, 3), (2, 2), padding="SAME", name="stem2")(x)
        x = nn.relu(nn.GroupNorm(num_groups=8, name="stem2_gn")(x))

        branches = [x]
        for b in range(1, len(self.widths)):
            branches.append(
                nn.Conv(self.widths[b], (3, 3), (2, 2), padding="SAME",
                        name=f"down_init_{b}")(branches[-1])
            )
        for s in range(self.n_stages):
            branches = [
                ConvBlock(self.widths[i], name=f"s{s}_b{i}")(h)
                for i, h in enumerate(branches)
            ]
            fused = []
            for i in range(len(branches)):
                acc = branches[i]
                for j in range(len(branches)):
                    if j == i:
                        continue
                    h = branches[j]
                    h = nn.Conv(self.widths[i], (1, 1), name=f"x{s}_{j}to{i}")(h)
                    h = resize_bilinear(h, acc.shape[1:3], align_corners=False)
                    acc = acc + h
                fused.append(nn.relu(acc))
            branches = fused
        top_hw = branches[0].shape[1:3]
        cat = jnp.concatenate(
            [resize_bilinear(h, top_hw, align_corners=False) for h in branches], -1
        )
        y = nn.Conv(self.widths[-1], (1, 1), name="head_proj")(cat)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), name="head_out")(y)
        return resize_bilinear(y, (H, W), align_corners=False)
