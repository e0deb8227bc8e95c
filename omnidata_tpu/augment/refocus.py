"""Refocus (thin-lens depth-of-field) augmentation — XLA-native rebuild of
omnidata_tools/torch/data/refocus_augmentation.py:16-203.

Pipeline per image:
1. band depth into n_quantiles equal-mass segments (per-image quantiles);
2. circle of confusion per quantile: c = A * |d - f| / d (no magnification);
3. blur stack: one separable gaussian per quantile radius (replicate-padded,
   cutoff = 3 * r like the torch code's cutoff_multiplier=3);
4. per-pixel composite between the two adjacent quantile blur levels with
   weights (1 - dist^2), normalized.

Random draws (focus distance = one of the quantiles; aperture log-uniform in
[min, max]) take a jax.random key.

XLA notes: the stack is computed with a fixed kernel width per quantile —
radii are traced values, so the gaussian is evaluated over a static window of
MAX_CUTOFF taps with the width controlled by the (traced) sigma; zero-sigma
degenerates to identity like the torch `r < 0.1` branch.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def _gaussian_window(std: jax.Array, m: int) -> jax.Array:
    """scipy/torch-style gaussian window of static length m for traced std;
    std <= ~0 yields a delta (identity blur)."""
    n = jnp.arange(m, dtype=jnp.float32) - (m - 1.0) / 2.0
    sig2 = 2.0 * jnp.maximum(std, 1e-6) ** 2
    w = jnp.exp(-(n**2) / sig2)
    delta = (jnp.abs(n) < 0.5).astype(jnp.float32)
    w = jnp.where(std < 0.1, delta, w)
    return w / jnp.sum(w)


def separable_gaussian(img: jax.Array, r: jax.Array, max_cutoff: int = 61) -> jax.Array:
    """Separable gaussian with replicate padding; img NCHW, traced radius r."""
    fil = _gaussian_window(r, max_cutoff)
    half = max_cutoff // 2
    B, C, H, W = img.shape
    x = jnp.pad(img, ((0, 0), (0, 0), (half, half), (half, half)), mode="edge")
    kh = fil.reshape(max_cutoff, 1, 1, 1)  # HWIO
    kw = fil.reshape(1, max_cutoff, 1, 1)
    x = x.reshape(B * C, 1, H + 2 * half, W + 2 * half).transpose(0, 2, 3, 1)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return x.transpose(0, 3, 1, 2).reshape(B, C, H, W)


def compute_circle_of_confusion_no_magnification(depths, aperture, focus_distance):
    # zero-depth (invalid) pixels would give 0/0 -> NaN, which 0-weight
    # composite levels still propagate (0 * NaN); clamp like the reference
    # demo pipeline does before calling in
    return aperture * jnp.abs(depths - focus_distance) / jnp.maximum(depths, 1e-3)


def compute_quantiles(depth: jax.Array, n_quantiles: int, eps: float = 1e-4):
    """Per-image equal-mass depth quantile values (B, n_quantiles+1)."""
    q = jnp.arange(n_quantiles + 1, dtype=jnp.float32) / n_quantiles
    flat = depth.reshape(depth.shape[0], -1)
    vals = jnp.quantile(flat, q, axis=1).T  # (B, n+1)
    vals = vals.at[:, 0].add(-eps)
    vals = vals.at[:, -1].add(eps)
    return vals


def compute_quantile_membership(depth: jax.Array, quantile_vals: jax.Array):
    """Per-pixel (dist_left, dist_right, idx_left, idx_right) against the
    per-image quantile boundaries (refocus_augmentation.py:89-104)."""
    B = depth.shape[0]
    flat = depth.reshape(B, -1)
    idx_right = jax.vmap(jnp.searchsorted)(quantile_vals, flat)
    idx_right = jnp.clip(idx_right, 1, quantile_vals.shape[1] - 1)
    idx_left = idx_right - 1
    q_r = jnp.take_along_axis(quantile_vals, idx_right, 1)
    q_l = jnp.take_along_axis(quantile_vals, idx_left, 1)
    d = q_r - q_l
    dist_right = (q_r - flat) / d
    dist_left = (flat - q_l) / d
    shp = depth.shape
    return (
        dist_left.reshape(shp),
        dist_right.reshape(shp),
        idx_left.reshape(shp),
        idx_right.reshape(shp),
    )


def get_blur_stack(rgb: jax.Array, blur_radii: jax.Array,
                   max_cutoff: int = 61) -> jax.Array:
    """(B,3,H,W) x per-image radii (B,Q) -> (B,Q,3,H,W)."""
    def per_level(r):  # r: (B,)
        return jax.vmap(
            lambda img, rr: separable_gaussian(img[None], rr, max_cutoff)[0]
        )(rgb, r)

    return jnp.stack([per_level(blur_radii[:, i]) for i in range(blur_radii.shape[1])], 1)


def composite_blur_stack(blur_stack, dist_left, dist_right, idx_left, idx_right):
    """Interpolate between adjacent blur levels with (1 - d^2) weights.

    blur_stack (B,Q,C,H,W); dist_* (B,1,H,W); idx_* (B,H,W)."""
    B, Q = blur_stack.shape[:2]
    sim_l = (1.0 - dist_left**2)[:, None]  # (B,1,1,H,W)
    sim_r = (1.0 - dist_right**2)[:, None]
    levels = jnp.arange(Q).reshape(1, Q, 1, 1, 1)
    il = idx_left[:, None, None]  # (B,1,1,H,W)
    ir = idx_right[:, None, None]
    w = jnp.where(levels == il, sim_l, 0.0) + jnp.where(levels == ir, sim_r, 0.0)
    w = w / jnp.sum(w, 1, keepdims=True)
    return jnp.sum(w * blur_stack, 1)


def refocus_image(rgb, depth, focus_distance, aperture, quantile_vals,
                  max_cutoff: int = 61):
    """rgb (B,3,H,W), depth (B,1,H,W), focus/aperture (B,1)."""
    dist_l, dist_r, idx_l, idx_r = compute_quantile_membership(depth, quantile_vals)
    radii = compute_circle_of_confusion_no_magnification(
        quantile_vals, aperture, focus_distance
    )  # (B, Q)
    stack = get_blur_stack(rgb, radii, max_cutoff)
    return composite_blur_stack(stack, dist_l, dist_r, idx_l[:, 0], idx_r[:, 0])


def refocus_augmentation(
    rgb: jax.Array,
    depth: jax.Array,
    key: jax.Array,
    n_quantiles: int = 8,
    aperture_min: float = 0.01,
    aperture_max: float = 1.0,
    max_cutoff: int = 61,
) -> jax.Array:
    """Random refocus: focus = a random interior quantile, aperture
    log-uniform (refocus_augmentation.py:163-203)."""
    B = rgb.shape[0]
    k1, k2 = jax.random.split(key)
    qvals = compute_quantiles(depth, n_quantiles)
    f_idx = jax.random.randint(k1, (B, 1), 1, n_quantiles)
    focus = jnp.take_along_axis(qvals, f_idx, 1)
    log_min, log_max = jnp.log(aperture_min), jnp.log(aperture_max)
    aperture = jnp.exp(jax.random.uniform(k2, (B, 1)) * (log_max - log_min) + log_min)
    return refocus_image(rgb, depth, focus, aperture, qvals, max_cutoff)
