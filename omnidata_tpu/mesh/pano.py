"""Equirectangular panorama rendering (the reference's CREATE_PANOS path:
settings.py:38 2048x1024 Cycles equirectangular camera, utils.py:372-377;
outputs like point_0006_view_equirectangular_domain_depth_euclidean.png).

Rays are generated on the spherical grid and ray-cast against the mesh in
pixel blocks (panos are rare relative to pinhole views, so the brute-force
chunked raycaster is the right tool — no tile binning over the sphere).

Convention: longitude sweeps left->right over [-pi, pi) with the camera's
-Z forward at lambda=0; latitude sweeps +pi/2 (top row) -> -pi/2 (bottom).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from .mesh import TriangleMesh
from .raster import Fragments, _BIG
from .raycast import raycast


def pano_rays(location: jax.Array, R: jax.Array, width: int = 2048,
              height: int = 1024):
    """(origin (3,), dirs (H,W,3)) for an equirectangular camera."""
    u = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    v = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    lam = u * 2.0 * jnp.pi - jnp.pi  # (W,)
    phi = jnp.pi / 2.0 - v * jnp.pi  # (H,)
    ll, pp = jnp.meshgrid(lam, phi, indexing="xy")  # (H,W)
    d_cam = jnp.stack(
        [jnp.sin(ll) * jnp.cos(pp), jnp.sin(pp), -jnp.cos(ll) * jnp.cos(pp)], -1
    )
    d_world = jnp.einsum("ij,hwj->hwi", R, d_cam, precision="highest")
    return location, d_world


@partial(jax.jit, static_argnames=("width", "height", "block"))
def render_pano(
    location: jax.Array,
    R: jax.Array,
    mesh: TriangleMesh,
    width: int = 2048,
    height: int = 1024,
    block: int = 65536,
) -> Fragments:
    """Panoramic Fragments; z == t (no planar z-buffer for a sphere)."""
    origin, dirs = pano_rays(location, R, width, height)
    flat = dirs.reshape(-1, 3)
    N = flat.shape[0]
    block = min(block, N)
    o = jnp.broadcast_to(origin, (block, 3))

    def body(i, acc):
        t_acc, f_acc, uv_acc = acc
        d = jax.lax.dynamic_slice_in_dim(flat, i * block, block)
        hits = raycast(o, d, mesh)
        t_acc = jax.lax.dynamic_update_slice_in_dim(t_acc, hits.t, i * block, 0)
        f_acc = jax.lax.dynamic_update_slice_in_dim(f_acc, hits.face, i * block, 0)
        uv_acc = jax.lax.dynamic_update_slice_in_dim(uv_acc, hits.bary, i * block, 0)
        return t_acc, f_acc, uv_acc

    n_blocks = (N + block - 1) // block
    init = (
        jnp.full((n_blocks * block,), _BIG),
        jnp.full((n_blocks * block,), -1, jnp.int32),
        jnp.zeros((n_blocks * block, 2)),
    )
    t, f, uv = jax.lax.fori_loop(0, n_blocks, body, init)
    t = t[:N].reshape(height, width)
    f = f[:N].reshape(height, width)
    uv = uv[:N].reshape(height, width, 2)
    valid = f >= 0
    t = jnp.where(valid, t, _BIG)
    return Fragments(t=t, z=t, face=f, bary=uv, valid=valid)


def pano_camera(location, R=None) -> Camera:
    """Camera wrapper for shading helpers (normals_to_camera etc.)."""
    if R is None:
        R = jnp.eye(3)
    return Camera(jnp.asarray(location), jnp.asarray(R), jnp.asarray(1.0), 0)
