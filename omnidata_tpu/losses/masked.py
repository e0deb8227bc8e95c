"""Masked pixel losses (reference: omnidata_tools/torch/losses/masked_losses.py:4-30).

All functions take NCHW arrays and a boolean mask broadcastable to the input.
They are pure functions of their inputs (no in-place mutation) and safe under
``jit``/``grad``: invalid pixels contribute exactly zero to both value and
gradient.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_l1_loss(preds: jax.Array, target: jax.Array, mask_valid: jax.Array) -> jax.Array:
    """sum(|pred - target| over valid) / count(valid).

    The mask broadcasts to the input (the reference always passes a mask
    expand_as'd to the target, masked_losses.py:4-7); the count is taken
    over the BROADCAST mask so a (B,1,H,W) mask on (B,3,H,W) preds yields
    the true masked mean, not 3x it."""
    mask = jnp.broadcast_to(mask_valid, preds.shape).astype(preds.dtype)
    err = jnp.abs(preds - target) * mask
    denom = jnp.sum(mask)
    return jnp.sum(err) / jnp.maximum(denom, 1.0) * jnp.where(denom > 0, 1.0, 0.0)


def masked_mse_loss(preds: jax.Array, target: jax.Array, mask_valid: jax.Array) -> jax.Array:
    mask = jnp.broadcast_to(mask_valid, preds.shape).astype(preds.dtype)
    err = jnp.square(preds - target) * mask
    denom = jnp.sum(mask)
    return jnp.sum(err) / jnp.maximum(denom, 1.0) * jnp.where(denom > 0, 1.0, 0.0)


def masked_cosine_angular_loss(
    preds: jax.Array, target: jax.Array, mask_valid: jax.Array
) -> jax.Array:
    """mean(-cos(pred, target)) over valid pixels.

    Inputs are surface normals encoded in [0, 1] (NCHW, C=3); they are mapped
    to [-1, 1], L2-normalized per pixel, and compared by negative cosine.
    The mask's first channel selects valid pixels (masked_losses.py:14-23).
    """
    p = jnp.clip(2.0 * preds - 1.0, -1.0, 1.0)
    t = jnp.clip(2.0 * target - 1.0, -1.0, 1.0)
    m = mask_valid[:, 0].astype(preds.dtype)  # (B,H,W)

    def _normalize(x):
        n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
        return x / jnp.maximum(n, 1e-12)

    cos = jnp.sum(_normalize(p) * _normalize(t), axis=1)  # (B,H,W)
    denom = jnp.sum(m)
    return jnp.sum(-cos * m) / jnp.maximum(denom, 1.0) * jnp.where(denom > 0, 1.0, 0.0)
