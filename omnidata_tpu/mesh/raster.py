"""Tile-binned ray-cast renderer: one pass per camera batch emits every
geometric label the reference needs four separate Blender renders for
(SURVEY.md §7 layer 2): z-buffer depth, euclidean depth, face ids
(fragments), barycentrics and the valid mask — normals/colors/labels are
gathered from the fragments afterwards (shade.py).

Two-level structure (the XLA path; a Pallas kernel shares the same binning):
1. **Bin**: project all triangles, compute conservative screen bboxes, build a
   fixed-capacity per-tile triangle list (``jnp.nonzero(size=cap)``).
2. **Rasterize**: for each image tile, scan its triangle list in chunks and
   Möller–Trumbore the tile's pixel rays against each chunk, keeping the
   closest hit. All shapes static; padding triangles are degenerate.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, camera_rays, extrinsic_RT, intrinsic_matrix
from .mesh import TriangleMesh
from .raycast import _intersect_chunk

_BIG = 1e30
_NEAR = 1e-4


class Fragments(NamedTuple):
    """Per-pixel geometry buffers for one view (all (H,W) unless noted).

    t: euclidean distance along the ray (the reference's depth_euclidean
       source) · z: distance along the camera forward axis (depth_zbuffer) ·
    face: hit face index or -1 · bary: (H,W,2) barycentric (u,v) ·
    valid: hit mask (mask_valid)."""

    t: jax.Array
    z: jax.Array
    face: jax.Array
    bary: jax.Array
    valid: jax.Array


def bin_triangles(camera: Camera, mesh: TriangleMesh, tile: int, cap: int):
    """Per-tile triangle lists (T, cap) + per-tile candidate counts (T,).

    Conservative: triangles with any vertex behind the near plane are binned
    to every tile (they're rare interior cases; correctness over speed)."""
    res = camera.resolution
    n_tiles_1d = res // tile
    T = n_tiles_1d * n_tiles_1d
    K = intrinsic_matrix(camera.fov, res)
    RT = extrinsic_RT(camera.location, camera.R)
    uv, z = (lambda r: (r[0], r[1]))(_project_all(K, RT, mesh.vertices))  # (V,2),(V,)

    tri_uv = uv[mesh.faces]  # (F,3,2)
    tri_z = z[mesh.faces]  # (F,3)
    behind = jnp.any(tri_z < _NEAR, -1)  # (F,)

    lo = jnp.min(tri_uv, 1)  # (F,2)
    hi = jnp.max(tri_uv, 1)
    F = mesh.faces.shape[0]
    live = jnp.arange(F) < mesh.num_faces

    tx = jnp.arange(n_tiles_1d) * tile
    overlap_x = (hi[:, 0:1] >= tx[None]) & (lo[:, 0:1] <= tx[None] + tile)  # (F,Tx)
    overlap_y = (hi[:, 1:2] >= tx[None]) & (lo[:, 1:2] <= tx[None] + tile)  # (F,Ty)
    overlap = overlap_y[:, :, None] & overlap_x[:, None, :]  # (F,Ty,Tx)
    overlap = (overlap | behind[:, None, None]) & live[:, None, None]
    overlap = overlap.reshape(F, T)

    counts = jnp.sum(overlap, 0)  # (T,)

    def per_tile(col):
        (idx,) = jnp.nonzero(col, size=cap, fill_value=F - 1)
        return idx.astype(jnp.int32)

    tile_tris = jax.vmap(per_tile, in_axes=1)(overlap)  # (T,cap)
    return tile_tris, counts


def _project_all(K, RT, pts):
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    cam = jnp.einsum("ij,nj->ni", RT, jnp.concatenate([pts, ones], -1),
                     precision="highest")
    zc = cam[:, 2]
    safe_z = jnp.where(jnp.abs(zc) < _NEAR, _NEAR, zc)
    uvw = jnp.einsum("ij,nj->ni", K, cam, precision="highest")
    uv = uvw[:, :2] / safe_z[:, None]
    return uv, zc


@partial(jax.jit, static_argnames=("tile", "cap", "chunk", "parallel_tiles"))
def render_view(
    camera: Camera,
    mesh: TriangleMesh,
    tile: int = 64,
    cap: int = 2048,
    chunk: int = 128,
    parallel_tiles: bool = False,
) -> Fragments:
    """Render one camera view to Fragments. resolution must be divisible by
    ``tile``; cap bounds triangles per tile (overflow drops farthest-binned —
    raise cap for dense meshes; see bin_triangles counts).

    parallel_tiles=True vmaps the per-tile rasterization (all tiles in
    flight — higher peak memory, much better TPU utilization); False runs
    tiles sequentially under lax.map (CPU-friendly)."""
    res = camera.resolution
    n1d = res // tile
    T = n1d * n1d
    P = tile * tile

    tile_tris, _ = bin_triangles(camera, mesh, tile, cap)

    origin, dirs = camera_rays(camera)  # (3,), (H,W,3)
    tile_dirs = (
        dirs.reshape(n1d, tile, n1d, tile, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(T, P, 3)
    )

    tris = mesh.vertices[mesh.faces]
    V0 = tris[:, 0]
    E1 = tris[:, 1] - tris[:, 0]
    E2 = tris[:, 2] - tris[:, 0]

    n_chunks = cap // chunk
    origins = jnp.broadcast_to(origin, (P, 3))

    def raster_tile(args):
        t_dirs, t_idx = args  # (P,3), (cap,)

        def body(carry, ci):
            best_t, best_f, best_uv = carry
            idx = jax.lax.dynamic_slice_in_dim(t_idx, ci * chunk, chunk)
            t, u, v, hit = _intersect_chunk(
                origins, t_dirs, V0[idx], E1[idx], E2[idx]
            )
            t = jnp.where(hit, t, _BIG)
            j = jnp.argmin(t, -1)
            tj = jnp.take_along_axis(t, j[:, None], -1)[:, 0]
            closer = tj < best_t
            fj = idx[j]
            best_f = jnp.where(closer, fj, best_f)
            uj = jnp.take_along_axis(u, j[:, None], -1)[:, 0]
            vj = jnp.take_along_axis(v, j[:, None], -1)[:, 0]
            best_uv = jnp.where(closer[:, None], jnp.stack([uj, vj], -1), best_uv)
            best_t = jnp.minimum(best_t, tj)
            return (best_t, best_f, best_uv), None

        init = (jnp.full((P,), _BIG), jnp.full((P,), -1, jnp.int32), jnp.zeros((P, 2)))
        (t, f, uv), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return t, f, uv

    if parallel_tiles:
        t, f, uv = jax.vmap(lambda d, i: raster_tile((d, i)))(tile_dirs, tile_tris)
    else:
        t, f, uv = jax.lax.map(raster_tile, (tile_dirs, tile_tris))  # (T,P)x2,(T,P,2)

    def untile(x):
        shp = x.shape[2:]
        return (
            x.reshape(n1d, n1d, tile, tile, *shp)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(shp)))
            .reshape(res, res, *shp)
        )

    t_img = untile(t)
    f_img = untile(f)
    uv_img = untile(uv)

    forward = camera.R @ jnp.asarray([0.0, 0.0, -1.0])
    cosang = jnp.einsum("hwc,c->hw", dirs, forward, precision="highest")
    valid = f_img >= 0
    z_img = jnp.where(valid, t_img * cosang, _BIG)
    return Fragments(
        t=jnp.where(valid, t_img, _BIG), z=z_img, face=f_img, bary=uv_img, valid=valid
    )


def render_views(cameras: Camera, mesh: TriangleMesh, tile: int = 64,
                 cap: int = 2048, chunk: int = 128,
                 parallel_tiles: bool = False) -> Fragments:
    """vmap of render_view over a leading camera batch dimension."""
    return jax.vmap(
        lambda loc, R, fov: render_view(
            Camera(loc, R, fov, cameras.resolution), mesh, tile, cap, chunk,
            parallel_tiles,
        )
    )(cameras.location, cameras.R, cameras.fov)
