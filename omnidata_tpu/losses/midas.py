"""MiDaS scale-shift-invariant depth loss + gradient-matching regularizer.

Numerically matched to the reference (omnidata_tools/torch/losses/midas_loss.py:10-157):

- ``ssi_mae``: median/MAD alignment of pred & gt over valid pixels, then
  masked L1.
- ``gradient_matching_term``: multi-scale masked gradient L1 on inverse depth
  aligned to inverse gt by least-squares scale/shift.
- ``midas_loss``: total = ssi + alpha * reg  (alpha=0.1, reduction='image-based').

XLA-first differences from the torch code: no in-place NaN masking — masked
medians are computed by sorting with invalid pixels pushed to +inf, and every
reduction is mask-weighted so the whole thing jits and differentiates cleanly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _masked_median(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-row masked (lower) median. x, mask: (..., N) -> (...).

    Matches torch.nanmedian: for an even count of valid elements the lower
    of the two middle values is returned; rows with no valid element give 0.
    """
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    count = jnp.sum(mask, axis=-1)
    idx = jnp.clip((count - 1) // 2, 0, x.shape[-1] - 1)
    med = jnp.take_along_axis(xs, idx[..., None], axis=-1)[..., 0]
    return jnp.where(count > 0, med, 0.0)


def masked_shift_and_scale(depth_pred: jax.Array, depth_gt: jax.Array, mask_valid: jax.Array):
    """Align pred & gt by masked median shift and mean-abs-dev scale.

    Shapes: (B, C, H, W); mask boolean. Returns (pred_aligned, gt_aligned).
    Reference: midas_loss.py:33-56 (note the ``sum(mask) + 1`` denominator).
    """
    B, C = depth_pred.shape[0], depth_pred.shape[1]
    flat = lambda x: x.reshape(B, C, -1)
    m = flat(mask_valid).astype(depth_pred.dtype)
    mask_sum = jnp.sum(m, -1, keepdims=True) + 1.0

    def _align(x):
        xf = flat(x)
        t = _masked_median(xf, flat(mask_valid))[..., None]  # (B,C,1)
        diff = jnp.abs(xf - t) * m
        s = jnp.sum(diff, -1, keepdims=True) / mask_sum
        return ((xf - t) / (s + 1e-6)).reshape(x.shape)

    return _align(depth_pred), _align(depth_gt)


def ssi_mae(depth_pred: jax.Array, depth_gt: jax.Array, mask_valid: jax.Array) -> jax.Array:
    """Scale-shift-invariant masked L1 (midas_loss.py:104-112)."""
    from .masked import masked_l1_loss

    pred_a, gt_a = masked_shift_and_scale(depth_pred, depth_gt, mask_valid)
    return masked_l1_loss(pred_a, gt_a, mask_valid)


def compute_scale_and_shift(prediction: jax.Array, target: jax.Array, mask: jax.Array):
    """Least-squares (scale, shift) aligning prediction to target over mask.

    Shapes: (B, H, W). Reference: midas_loss.py:10-30.
    """
    m = mask.astype(prediction.dtype)
    a_00 = jnp.sum(m * prediction * prediction, (1, 2))
    a_01 = jnp.sum(m * prediction, (1, 2))
    a_11 = jnp.sum(m, (1, 2))
    b_0 = jnp.sum(m * prediction * target, (1, 2))
    b_1 = jnp.sum(m * target, (1, 2))
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    denom = jnp.where(valid, det + 1e-6, 1.0)
    x_0 = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / denom, 0.0)
    x_1 = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / denom, 0.0)
    return x_0, x_1


def _gradient_loss_image(prediction, target, mask):
    """Per-image masked gradient L1 sum; returns (image_loss (B,), M (B,))."""
    m = mask.astype(prediction.dtype)
    M = jnp.sum(m, (1, 2))
    diff = (prediction - target) * m
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (m[:, :, 1:] * m[:, :, :-1])
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (m[:, 1:, :] * m[:, :-1, :])
    return jnp.sum(grad_x, (1, 2)) + jnp.sum(grad_y, (1, 2)), M


def _reduce(image_loss, M, reduction: str):
    if reduction == "batch-based":
        divisor = jnp.sum(M)
        return jnp.where(divisor > 0, jnp.sum(image_loss) / jnp.maximum(divisor, 1.0), 0.0)
    # image-based: per-image mean over valid pixels, then mean over images
    per_image = jnp.where(M > 0, image_loss / jnp.maximum(M, 1.0), image_loss)
    return jnp.mean(per_image)


def gradient_matching_term(
    prediction: jax.Array,
    target: jax.Array,
    mask: jax.Array,
    scales: int = 4,
    reduction: str = "batch-based",
) -> jax.Array:
    """Multi-scale gradient matching (midas_loss.py:114-134): 2**k strided
    subsampling, k in [0, scales)."""
    total = 0.0
    for scale in range(scales):
        step = 2**scale
        il, M = _gradient_loss_image(
            prediction[:, ::step, ::step], target[:, ::step, ::step], mask[:, ::step, ::step]
        )
        total = total + _reduce(il, M, reduction)
    return total


@partial(jax.jit, static_argnames=("alpha", "scales", "reduction"))
def midas_loss(
    depth_pred: jax.Array,
    depth_gt: jax.Array,
    mask_valid: jax.Array,
    alpha: float = 0.1,
    scales: int = 4,
    reduction: str = "image-based",
):
    """Full MiDaS loss (midas_loss.py:137-157).

    Inputs NCHW with C=1 (mask boolean). Returns (total, ssi, reg).
    The regularizer operates on inverse depth, with the inverse prediction
    least-squares aligned to inverse gt.
    """
    pred_inv = 1.0 / (depth_pred[:, 0] + 1e-6)
    gt_inv = 1.0 / (depth_gt[:, 0] + 1e-6)
    ssi = ssi_mae(depth_pred, depth_gt, mask_valid)
    m = mask_valid[:, 0]
    scale, shift = compute_scale_and_shift(pred_inv, gt_inv, m)
    pred_ssi = scale[:, None, None] * pred_inv + shift[:, None, None]
    reg = gradient_matching_term(pred_ssi, gt_inv, m, scales=scales, reduction=reduction)
    total = ssi + alpha * reg
    return total, ssi, reg
