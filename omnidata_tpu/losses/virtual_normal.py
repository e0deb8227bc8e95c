"""Virtual Normal Loss (reference: omnidata_tools/torch/losses/virtual_normal_loss.py:7-205).

Unprojects depth maps to point clouds, samples random pixel triplets, filters
degenerate triangles (near-collinear, tiny depth, all-coordinates-near pairs),
and penalizes the L1 difference between the unit normals of the gt and
predicted virtual planes, with the easiest 25% of triplets dropped.

XLA-first design: everything is fixed-shape. Triplet filtering produces a
boolean validity mask instead of boolean indexing; the 25% hard-example
selection is a masked rank threshold over the sorted losses. Sampling takes an
explicit ``jax.random`` key (the torch code uses global numpy RNG).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class VNLParams(NamedTuple):
    focal_x: float
    focal_y: float
    input_size: tuple  # (H, W)
    delta_cos: float = 0.867
    delta_diff_x: float = 0.005
    delta_diff_y: float = 0.005
    delta_diff_z: float = 0.005
    delta_z: float = 0.0001
    sample_ratio: float = 0.15


def transfer_xyz(depth: jax.Array, params: VNLParams) -> jax.Array:
    """Depth (B,1,H,W) -> camera-space points (B,H,W,3) with pixel-index
    intrinsics (u0 = W//2, v0 = H//2; virtual_normal_loss.py:29-50)."""
    H, W = params.input_size
    u = jnp.arange(W, dtype=depth.dtype) - (W // 2)
    v = jnp.arange(H, dtype=depth.dtype) - (H // 2)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    d = depth[:, 0]
    x = uu * jnp.abs(d) / params.focal_x
    y = vv * jnp.abs(d) / params.focal_y
    return jnp.stack([x, y, d], -1)


def sample_triplets(key: jax.Array, params: VNLParams) -> jax.Array:
    """Three flat pixel-index sets, shape (3, N) with N = ratio * H * W."""
    H, W = params.input_size
    num = H * W
    n = int(num * params.sample_ratio)
    return jax.random.randint(key, (3, n), 0, num)


def _form_groups(pw: jax.Array, p123: jax.Array) -> jax.Array:
    """pw (B,H,W,3), indices (3,N) -> groups (B,N,3(xyz),3(points))."""
    B, H, W, _ = pw.shape
    flat = pw.reshape(B, H * W, 3)
    g = flat[:, p123, :]  # (B,3,N,3)
    return jnp.transpose(g, (0, 2, 3, 1))  # (B,N,xyz,points)


def _valid_mask(pw_gt_groups: jax.Array, params: VNLParams) -> jax.Array:
    """Boolean (B,N) triplet validity (virtual_normal_loss.py:101-133)."""
    pw = pw_gt_groups
    pw12 = pw[..., 1] - pw[..., 0]
    pw13 = pw[..., 2] - pw[..., 0]
    pw23 = pw[..., 2] - pw[..., 1]
    pw_diff = jnp.stack([pw12, pw13, pw23], -1)  # (B,N,3(xyz),3(pairs))

    # pairwise cosine similarity of the three edge vectors
    q = jnp.swapaxes(pw_diff, -1, -2)  # (B,N,pairs,xyz)
    norms = jnp.sqrt(jnp.sum(q * q, -1))  # (B,N,3)
    nm = norms[..., :, None] * norms[..., None, :]
    energy = jnp.einsum("...ik,...jk->...ij", q, q, precision="highest")
    norm_energy = energy / (nm + 1e-8)
    flat_e = norm_energy.reshape(norm_energy.shape[:-2] + (9,))
    mask_cos = jnp.sum((flat_e > params.delta_cos) | (flat_e < -params.delta_cos), -1) > 3

    mask_pad = jnp.sum(pw[..., 2, :] > params.delta_z, -1) == 3

    near = lambda i, d: jnp.sum(jnp.abs(pw_diff[..., i, :]) < d, -1) > 0
    mask_near_all = near(0, params.delta_diff_x) & near(1, params.delta_diff_y) & near(2, params.delta_diff_z)

    return mask_pad & ~(mask_near_all | mask_cos)


def _unit_normals(groups: jax.Array) -> jax.Array:
    """Triangle normals for groups (B,N,xyz,points); zero-norm guarded by
    the reference's +0.01 trick (virtual_normal_loss.py:176-189)."""
    p12 = groups[..., 1] - groups[..., 0]
    p13 = groups[..., 2] - groups[..., 0]
    n = jnp.cross(p12, p13)
    s = jnp.sum(n * n, -1, keepdims=True)
    # sqrt has a NaN gradient at 0 (degenerate triplets from with-replacement
    # sampling hit it); guard the branch not taken.
    norm = jnp.sqrt(jnp.where(s == 0.0, 1.0, s))
    norm = jnp.where(s == 0.0, 0.01, norm)
    return n / norm


def vnl_from_indices(
    gt_depth: jax.Array,
    pred_depth: jax.Array,
    p123: jax.Array,
    params: VNLParams,
    select: bool = True,
) -> jax.Array:
    """VNL given explicit triplet indices (3,N). Fixed-shape equivalent of
    VNL_Loss.forward (virtual_normal_loss.py:154-200)."""
    pw_gt = transfer_xyz(gt_depth, params)
    pw_pred = transfer_xyz(pred_depth, params)
    g_gt = _form_groups(pw_gt, p123)
    g_pred = _form_groups(pw_pred, p123)
    valid = _valid_mask(g_gt, params)  # (B,N)

    # z==0 guard on predictions (intent of virtual_normal_loss.py:146)
    z = g_pred[..., 2, :]
    g_pred = g_pred.at[..., 2, :].set(jnp.where(z == 0.0, 1e-4, z))

    n_gt = _unit_normals(g_gt)
    n_pred = _unit_normals(g_pred)
    loss_per_group = jnp.sum(jnp.abs(n_gt - n_pred), -1)  # (B,N)

    lf = loss_per_group.reshape(-1)
    vf = valid.reshape(-1)
    n_valid = jnp.sum(vf)
    if not select:
        return jnp.sum(lf * vf) / jnp.maximum(n_valid, 1)

    # Hard-example mining: drop the smallest 25% of valid losses, average rest.
    big = jnp.asarray(jnp.finfo(lf.dtype).max, lf.dtype)
    ls = jnp.sort(jnp.where(vf, lf, big))
    start = (n_valid * 0.25).astype(jnp.int32)
    idx = jnp.arange(lf.shape[0])
    keep = (idx >= start) & (idx < n_valid)
    cnt = jnp.sum(keep)
    return jnp.sum(jnp.where(keep, ls, 0.0)) / jnp.maximum(cnt, 1)


@partial(jax.jit, static_argnames=("params", "select"))
def virtual_normal_loss(
    gt_depth: jax.Array,
    pred_depth: jax.Array,
    key: jax.Array,
    params: VNLParams,
    select: bool = True,
) -> jax.Array:
    """Full VNL: sample triplets with ``key`` then score. Shapes (B,1,H,W)."""
    p123 = sample_triplets(key, params)
    return vnl_from_indices(gt_depth, pred_depth, p123, params, select=select)
