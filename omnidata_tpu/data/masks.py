"""Validity masks (reference: omnidata_tools/torch/data/masks.py:11-58 and
train_*.py make_valid_mask:205-242): mask from a sentinel value, then the
*invalid* region is dilated by max-pooling so the loss ignores a safety band
around holes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_pool_size",))
def build_mask(target: jax.Array, val: float = 0.0, max_pool_size: int = 4,
               tol: float = 1e-3) -> jax.Array:
    """NCHW target -> boolean mask (N,1,H,W); pixels within ``tol`` of
    ``val`` on EVERY channel are invalid, with the invalid region dilated
    by a max_pool_size window. The tolerance band matches the reference
    (masks.py:14: val±1e-3) — quantized 8-bit sentinels never equal the
    registry value exactly (normal's 0.502 is 128/255 = 0.50196 on disk)."""
    near = (target >= val - tol) & (target <= val + tol)
    invalid = jnp.all(near, axis=1, keepdims=True).astype(jnp.float32)
    dil = jax.lax.reduce_window(
        invalid,
        -jnp.inf,
        jax.lax.max,
        (1, 1, max_pool_size, max_pool_size),
        (1, 1, 1, 1),
        "SAME",
    )
    return dil < 0.5


@partial(jax.jit, static_argnames=("max_pool_size",))
def dilate_invalid(mask_valid: jax.Array, max_pool_size: int = 8) -> jax.Array:
    """Dilate the invalid region of a boolean NCHW mask with a stride-1
    max window (generic safety band; the reference-exact training mask is
    make_valid_mask below)."""
    invalid = (~mask_valid).astype(jnp.float32)
    dil = jax.lax.reduce_window(
        invalid,
        -jnp.inf,
        jax.lax.max,
        (1, 1, max_pool_size, max_pool_size),
        (1, 1, 1, 1),
        "SAME",
    )
    return dil < 0.5


@partial(jax.jit, static_argnames=("max_pool_size",))
def make_valid_mask(mask_valid: jax.Array, max_pool_size: int = 4) -> jax.Array:
    """The reference's training-time valid mask (train_normal.py /
    train_depth.py make_valid_mask:215-242): invert, STRIDED max-pool
    (kernel == stride == max_pool_size), nearest-upsample back — i.e. any
    max_pool_size² tile containing an invalid pixel is wholly invalid.
    (A stride-1 window would mask a ~2x wider band around holes.)"""
    mask_valid = mask_valid.astype(jnp.float32)
    B, C, H, W = mask_valid.shape
    mp = max_pool_size
    assert H % mp == 0 and W % mp == 0, (H, W, mp)
    inv = 1.0 - mask_valid
    blocked = inv.reshape(B, C, H // mp, mp, W // mp, mp).max((3, 5))
    up = jnp.repeat(jnp.repeat(blocked, mp, axis=2), mp, axis=3)
    return up == 0.0
