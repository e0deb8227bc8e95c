"""Test-time augmentation for surface normals — the role of the reference's
`tta.SurfaceNormalsTTAWrapper(model, transforms, merger_fn=MedianMerger)`
in paper_code/oasis_eval_tta.py:446-447: run the model over a set of input
augmentations, invert each prediction back into the original frame
(horizontal flip also negates the normal x component; scales resize back),
and merge with a per-pixel median, then L2-normalize.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _resize_nchw(x, h, w):
    B, C = x.shape[0], x.shape[1]
    return jax.image.resize(x, (B, C, h, w), method="bilinear")


class SurfaceNormalsTTA:
    """Wrap model_fn (x_nchw -> normals (B,3,H,W), [-1,1]) with flip/scale
    TTA. transforms = identity, [hflip], and any extra scales."""

    def __init__(
        self,
        model_fn: Callable,
        hflip: bool = True,
        scales: Sequence[float] = (),
        merger: str = "median",
    ):
        self.model_fn = model_fn
        self.hflip = hflip
        self.scales = tuple(scales)
        self.merger = merger

    def __call__(self, x):
        H, W = x.shape[2], x.shape[3]
        preds = [self.model_fn(x)]
        if self.hflip:
            y = self.model_fn(x[..., ::-1])[..., ::-1]
            # mirror flips the x component of a normal field
            preds.append(y.at[:, 0].multiply(-1.0))
        for s in self.scales:
            # snap to the backbone stride (DPT needs H, W % 16 == 0)
            sh = max(16, int(round(H * s / 16.0)) * 16)
            sw = max(16, int(round(W * s / 16.0)) * 16)
            y = self.model_fn(_resize_nchw(x, sh, sw))
            preds.append(_resize_nchw(y, H, W))
        stack = jnp.stack(preds)
        if self.merger == "median":
            merged = jnp.median(stack, axis=0)
        else:
            merged = jnp.mean(stack, axis=0)
        n = jnp.sqrt(jnp.sum(merged * merged, 1, keepdims=True))
        return merged / jnp.maximum(n, 1e-8)
