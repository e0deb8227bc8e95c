"""Batched ray-triangle intersection (Möller–Trumbore) — the compute kernel
that replaces both Blender's renderer and its ``scene.ray_cast`` LOS checks
(generate_points.py:496-525).

Fixed shapes throughout: rays are processed against triangle *chunks* with a
``lax.scan`` min-reduction, so the working set stays VPU-sized and XLA can
pipeline the gathers. Degenerate (padding) triangles have zero determinant and
never hit.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .mesh import TriangleMesh

_EPS = 1e-7
_BIG = 1e30


class RayHits(NamedTuple):
    """t: ray-length to hit (BIG if none) · face: face index (-1 if none) ·
    bary: (u, v) barycentric coords of the hit · valid: boolean hit mask."""

    t: jax.Array
    face: jax.Array
    bary: jax.Array
    valid: jax.Array


def _intersect_chunk(origins, dirs, v0, e1, e2):
    """Möller–Trumbore for rays (N,3) vs triangle chunk (C,3)-arrays.

    Returns per-(ray, tri): t (N,C), u, v, hit mask. No backface culling
    (Blender BI renders backfaces; LOS checks want any hit).
    """
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])  # (N,C,3)
    det = jnp.sum(e1[None] * pvec, -1)  # (N,C)
    inv_det = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvec = origins[:, None, :] - v0[None]  # (N,C,3)
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1[None])
    v = jnp.sum(dirs[:, None, :] * qvec, -1) * inv_det
    t = jnp.sum(e2[None] * qvec, -1) * inv_det
    # Edge slack avoids cracks along shared triangle edges (a ray exactly on
    # the diagonal of a quad must hit at least one of its triangles).
    e = 1e-5
    hit = (
        (jnp.abs(det) >= _EPS)
        & (u >= -e)
        & (v >= -e)
        & (u + v <= 1.0 + e)
        & (t > _EPS)
    )
    return t, u, v, hit


@partial(jax.jit, static_argnames=("chunk",))
def raycast(
    origins: jax.Array,
    dirs: jax.Array,
    mesh: TriangleMesh,
    chunk: int = 256,
) -> RayHits:
    """Closest-hit raycast of rays (N,3)+(N,3) against the whole mesh.

    Scans the padded face list in chunks; per step the (N, chunk) test is one
    fused VPU block. Memory O(N*chunk)."""
    F = mesh.faces.shape[0]
    chunk = min(chunk, F)
    assert F % chunk == 0, (F, chunk)
    n_chunks = F // chunk
    tris = mesh.vertices[mesh.faces]  # (F,3,3)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]

    N = origins.shape[0]
    init = (
        jnp.full((N,), _BIG),
        jnp.full((N,), -1, jnp.int32),
        jnp.zeros((N, 2)),
    )

    def body(carry, ci):
        best_t, best_f, best_uv = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        t, u, v, hit = _intersect_chunk(origins, dirs, sl(v0), sl(e1), sl(e2))
        t = jnp.where(hit, t, _BIG)
        j = jnp.argmin(t, -1)  # (N,)
        tj = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
        closer = tj < best_t
        best_f = jnp.where(closer, ci * chunk + j, best_f)
        uj = jnp.take_along_axis(u, j[:, None], -1)[:, 0]
        vj = jnp.take_along_axis(v, j[:, None], -1)[:, 0]
        best_uv = jnp.where(closer[:, None], jnp.stack([uj, vj], -1), best_uv)
        best_t = jnp.minimum(best_t, tj)
        return (best_t, best_f, best_uv), None

    (t, f, uv), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return RayHits(t=t, face=f, bary=uv, valid=f >= 0)


@partial(jax.jit, static_argnames=("chunk",))
def any_hit_within(
    origins: jax.Array,
    dirs: jax.Array,
    max_t: jax.Array,
    mesh: TriangleMesh,
    chunk: int = 256,
) -> jax.Array:
    """Occlusion query: does any triangle block the segment origin -> origin +
    max_t*dir (exclusive, with tolerance)? Used for line-of-sight checks.

    max_t: (N,). Returns boolean (N,). The reference accepts a hit within 1mm
    of the target as 'visible' (generate_points.py:496-525); callers pass
    max_t = dist - tol.
    """
    F = mesh.faces.shape[0]
    chunk = min(chunk, F)
    assert F % chunk == 0, (F, chunk)
    n_chunks = F // chunk
    tris = mesh.vertices[mesh.faces]
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]

    def body(blocked, ci):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        t, _, _, hit = _intersect_chunk(origins, dirs, sl(v0), sl(e1), sl(e2))
        blocked = blocked | jnp.any(hit & (t < max_t[:, None]), -1)
        return blocked, None

    blocked, _ = jax.lax.scan(
        body, jnp.zeros(origins.shape[0], bool), jnp.arange(n_chunks)
    )
    return blocked


def count_crossings(origins: jax.Array, dirs: jax.Array, mesh: TriangleMesh,
                    chunk: int = 256) -> jax.Array:
    """Number of surface crossings along each ray — parity test for
    inside-mesh detection (generate_camera_poses.py:228-246)."""
    F = mesh.faces.shape[0]
    chunk = min(chunk, F)
    assert F % chunk == 0, (F, chunk)
    n_chunks = F // chunk
    tris = mesh.vertices[mesh.faces]
    v0, e1, e2 = tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]

    def body(count, ci):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk)
        _, _, _, hit = _intersect_chunk(origins, dirs, sl(v0), sl(e1), sl(e2))
        return count + jnp.sum(hit, -1), None

    count, _ = jax.lax.scan(body, jnp.zeros(origins.shape[0], jnp.int32),
                            jnp.arange(n_chunks))
    return count
