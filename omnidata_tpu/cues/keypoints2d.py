"""2D keypoints: SURF determinant-of-Hessian "interest image".

Reimplements the reference's _blob_doh pipeline
(create_keypoints_2d_images.py:64-201, itself skimage's blob_doh with the
NMS removed): integral image -> box-filter Hessian determinant
(skimage _hessian_det_appx, the SURF approximation) at 10 sigmas
linspace(1, 30, 10) -> max over scales -> 16-bit.

TPU-first: the box sums are O(1) gathers on the integral image with
*static* offsets per sigma, batched over all pixels — 10 fused gather
passes per image, no data-dependent work.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def integral_image(img: jax.Array) -> jax.Array:
    return jnp.cumsum(jnp.cumsum(img, 0), 1)


def _box_sum(ii: jax.Array, r0, c0, rl, cl) -> jax.Array:
    """Sum of img[r0:r0+rl, c0:c0+cl] for every pixel offset, via the integral
    image with clipped indices (matches skimage _integ's clipping).

    r0/c0 are *relative* offsets from each output pixel; returns (H,W)."""
    H, W = ii.shape
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]

    def at(dr, dc):
        r = jnp.clip(rows + dr, -1, H - 1)
        c = jnp.clip(cols + dc, -1, W - 1)
        val = ii[jnp.maximum(r, 0), jnp.maximum(c, 0)]
        return jnp.where((r < 0) | (c < 0), 0.0, val)

    r1, c1 = r0 - 1, c0 - 1
    r2, c2 = r0 + rl - 1, c0 + cl - 1
    return at(r2, c2) - at(r1, c2) - at(r2, c1) + at(r1, c1)


def hessian_det_appx(ii: jax.Array, sigma: float) -> jax.Array:
    """SURF box-filter Hessian determinant at one scale, from the integral
    image (skimage.feature._hessian_det_appx semantics)."""
    size = int(3 * sigma)
    s2 = (size - 1) // 2
    s3 = size // 3
    w = size
    w_i = 1.0 / (size * size)

    # Dxy: four s3 x s3 corner boxes
    tl = _box_sum(ii, -s3, -s3, s3, s3)
    br = _box_sum(ii, 1, 1, s3, s3)
    bl = _box_sum(ii, 1, -s3, s3, s3)
    tr = _box_sum(ii, -s3, 1, s3, s3)
    dxy = -(bl + tr - tl - br) * w_i

    # Dxx: wide middle band minus 3x the central lobe
    mid = _box_sum(ii, -s3 + 1, -s2, 2 * s3 - 1, w)
    side = _box_sum(ii, -s3 + 1, -(s3 // 2), 2 * s3 - 1, s3)
    dxx = -(mid - 3.0 * side) * w_i

    mid = _box_sum(ii, -s2, -s3 + 1, w, 2 * s3 - 1)
    side = _box_sum(ii, -(s3 // 2), -s3 + 1, s3, 2 * s3 - 1)
    dyy = -(mid - 3.0 * side) * w_i

    return dxx * dyy - 0.81 * (dxy * dxy)


@partial(jax.jit, static_argnames=("min_sigma", "max_sigma", "num_sigma"))
def keypoints2d(
    gray: jax.Array,
    min_sigma: float = 1.0,
    max_sigma: float = 30.0,
    num_sigma: int = 10,
) -> jax.Array:
    """DoH interest image in [0,1]-ish float from grayscale [0,1] (H,W)."""
    ii = integral_image(gray.astype(jnp.float32))
    sigmas = np.linspace(min_sigma, max_sigma, num_sigma)
    resp = jnp.stack([hessian_det_appx(ii, float(s)) for s in sigmas], 0)
    return jnp.max(resp, 0)
