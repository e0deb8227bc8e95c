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
    """Dilate the invalid region of a boolean NCHW mask (train_depth.py's
    make_valid_mask uses max-pool on the inverted mask)."""
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
