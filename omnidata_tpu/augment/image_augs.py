"""2D augmentations — the kornia cascade + multi-scale resize/crop of the
reference (omnidata_tools/torch/data/augmentation.py:14-121), as pure JAX.

augment_rgb: probability-gated sharpness -> motion blur -> gaussian blur.
resize_crop: multi-scale {256..512} resize with center/random crop, the
shape-bucketed XLA version (output size is static per call).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..models.layers import resize_bilinear


def _conv2d_same(img_nchw, kernel_2d):
    kh, kw = kernel_2d.shape
    B, C, H, W = img_nchw.shape
    x = img_nchw.reshape(B * C, H, W, 1)
    k = kernel_2d.reshape(kh, kw, 1, 1)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y.reshape(B, C, H, W)


def sharpness(img: jax.Array, factor: jax.Array) -> jax.Array:
    """kornia RandomSharpness: blend with a fixed 3x3 smoothing kernel."""
    k = jnp.asarray([[1.0, 1, 1], [1, 5, 1], [1, 1, 1]]) / 13.0
    smooth = _conv2d_same(img, k)
    out = img + (img - smooth) * factor.reshape(-1, 1, 1, 1)
    return jnp.clip(out, 0.0, 1.0)


def motion_blur(img: jax.Array, key: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Random-direction linear motion blur (horizontal/vertical/diagonals)."""
    d = jax.random.randint(key, (), 0, 4)
    eye = jnp.eye(kernel_size)
    kernels = jnp.stack(
        [
            (jnp.where(jnp.arange(kernel_size)[:, None] == kernel_size // 2, 1.0, 0.0)
             / kernel_size * jnp.ones((1, kernel_size))),  # horizontal line
            (jnp.where(jnp.arange(kernel_size)[None, :] == kernel_size // 2, 1.0, 0.0)
             / kernel_size * jnp.ones((kernel_size, 1))),  # vertical line
            eye / kernel_size,
            eye[::-1] / kernel_size,
        ]
    )
    k = kernels[d]
    return _conv2d_same(img, k)


def gaussian_blur(img: jax.Array, sigma: jax.Array, kernel_size: int = 5) -> jax.Array:
    n = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    w = jnp.exp(-(n**2) / (2.0 * jnp.maximum(sigma, 1e-6) ** 2))
    w = w / jnp.sum(w)
    k = w[:, None] * w[None, :]
    return _conv2d_same(img, k)


def augment_rgb(
    rgb: jax.Array,
    key: jax.Array,
    p_sharpness: float = 0.4,
    p_motion: float = 0.2,
    p_gauss: float = 0.2,
) -> jax.Array:
    """The reference's cascade (augmentation.py:19-67), p-gated per batch."""
    ks = jax.random.split(key, 6)
    out = rgb
    sf = jax.random.uniform(ks[0], (rgb.shape[0],)) * 1.0
    out = jnp.where(jax.random.uniform(ks[1]) < p_sharpness, sharpness(out, sf), out)
    out = jnp.where(
        jax.random.uniform(ks[2]) < p_motion, motion_blur(out, ks[3]), out
    )
    sg = jax.random.uniform(ks[4], (), minval=0.1, maxval=2.0)
    out = jnp.where(jax.random.uniform(ks[5]) < p_gauss, gaussian_blur(out, sg), out)
    return out


def resize_crop(
    batch: dict,
    key: jax.Array,
    out_size: int,
    random_crop: bool = False,
    rgb_keys: tuple = ("rgb",),
) -> dict:
    """Joint resize(+crop) of an NCHW task dict to a static out_size.

    rgb resizes bilinear, labels nearest (reference resize_augmentation:69-121
    with the fixed_size path used by training)."""
    out = {}
    ref = next(v for v in batch.values()
               if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 4)
    H, W = ref.shape[-2], ref.shape[-1]
    can_crop = H >= out_size and W >= out_size  # else: resize path below
    if random_crop and can_crop:
        kh, kw = jax.random.split(key)
        off = jnp.stack([
            jax.random.randint(kh, (), 0, H - out_size + 1),
            jax.random.randint(kw, (), 0, W - out_size + 1),
        ])
    else:
        off = jnp.asarray([(max(H - out_size, 0)) // 2,
                           (max(W - out_size, 0)) // 2], jnp.int32)
    for k, v in batch.items():
        if not hasattr(v, "shape") or v.ndim < 4:
            out[k] = v
            continue
        if v.shape[-1] == out_size and v.shape[-2] == out_size:
            out[k] = v
        elif can_crop and v.shape[-2] >= out_size and v.shape[-1] >= out_size:
            out[k] = jax.lax.dynamic_slice(
                v,
                (0, 0, off[0], off[1]),
                (v.shape[0], v.shape[1], out_size, out_size),
            )
        else:
            nhwc = jnp.transpose(v, (0, 2, 3, 1))
            method = "bilinear" if k in rgb_keys else "nearest"
            if method == "bilinear":
                r = resize_bilinear(nhwc, (out_size, out_size))
            else:
                r = jax.image.resize(
                    nhwc, (v.shape[0], out_size, out_size, v.shape[1]), "nearest"
                )
            out[k] = jnp.transpose(r, (0, 3, 1, 2))
    return out
