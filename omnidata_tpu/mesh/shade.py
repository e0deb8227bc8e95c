"""Fragment shading: gather/interpolate mesh attributes at rasterized pixels.

Everything the reference's per-modality Blender materials + compositor
nodetrees do with the geometry happens here as pure gathers over Fragments
(raster.py) — smooth normals, flat normals, vertex colors, face labels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from .mesh import TriangleMesh
from .raster import Fragments


def _bary_weights(frag: Fragments):
    u = frag.bary[..., 0]
    v = frag.bary[..., 1]
    return 1.0 - u - v, u, v  # weights for v0, v1, v2


def interpolate_vertex_attribute(frag: Fragments, mesh: TriangleMesh,
                                 attr: jax.Array) -> jax.Array:
    """Barycentric interpolation of a per-vertex attribute (V,C) -> (H,W,C)."""
    face = jnp.maximum(frag.face, 0)
    vids = mesh.faces[face]  # (H,W,3)
    a = attr[vids]  # (H,W,3,C)
    w0, w1, w2 = _bary_weights(frag)
    return a[..., 0, :] * w0[..., None] + a[..., 1, :] * w1[..., None] + a[..., 2, :] * w2[..., None]


def smooth_normals_world(frag: Fragments, mesh: TriangleMesh) -> jax.Array:
    """Smooth-shaded world-space normals (H,W,3), unit length.

    The reference enables smooth shading before the normals render
    (create_normal_images.py via utils smooth-shading; vertex normals)."""
    n = interpolate_vertex_attribute(frag, mesh, mesh.vertex_normals)
    norm = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
    return n / jnp.maximum(norm, 1e-12)


def flat_normals_world(frag: Fragments, mesh: TriangleMesh) -> jax.Array:
    face = jnp.maximum(frag.face, 0)
    return mesh.face_normals[face]


def normals_to_camera(n_world: jax.Array, camera: Camera) -> jax.Array:
    """World -> Blender camera frame (x right, y up, z toward viewer):
    n_cam = R_obj^T n_world. Front-facing surfaces have z > 0."""
    return jnp.einsum("ji,hwj->hwi", camera.R, n_world, precision="highest")


def face_labels(frag: Fragments, mesh: TriangleMesh, background: int = 0) -> jax.Array:
    """Semantic label image from per-face labels (H,W) int32
    (reference: create_semantic_images.py renders per-label materials)."""
    lab = mesh.face_labels[jnp.maximum(frag.face, 0)]
    return jnp.where(frag.valid, lab, background)


def face_flat_colors(frag: Fragments, mesh: TriangleMesh,
                     background: float = 0.0) -> jax.Array:
    """Flat per-face material colors (H,W,3) in [0,1] — the obj+mtl
    per-face-material rgb variant (create_rgb_images_obj_mtl.py renders
    shadeless materials; colors baked in load_obj_mtl)."""
    col = mesh.face_colors[jnp.maximum(frag.face, 0)]
    return jnp.where(frag.valid[..., None], col, background)


def vertex_colors(frag: Fragments, mesh: TriangleMesh,
                  background: float = 0.0) -> jax.Array:
    """Interpolated vertex-color image (H,W,3) in [0,1]
    (reference: create_rgb_images.py vertex-color path)."""
    c = interpolate_vertex_attribute(frag, mesh, mesh.vertex_colors)
    return jnp.where(frag.valid[..., None], c, background)


def hit_points_world(frag: Fragments, camera: Camera) -> jax.Array:
    """World-space hit positions (H,W,3) (for reshading, curvature etc.)."""
    from ..core.cameras import camera_rays

    origin, dirs = camera_rays(camera)
    return origin + frag.t[..., None] * dirs


def textured_colors(frag: Fragments, mesh: TriangleMesh,
                    background: float = 0.0) -> jax.Array:
    """RGB from the mesh texture atlas via interpolated uvs + bilinear sample
    (reference: create_rgb_images_textured.py). Requires vertex_uvs+texture."""
    uv = interpolate_vertex_attribute(frag, mesh, mesh.vertex_uvs)  # (H,W,2)
    tex = mesh.texture
    th, tw = tex.shape[0], tex.shape[1]
    # uv origin bottom-left (OBJ convention) -> image row
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (tw - 1)
    y = (1.0 - jnp.clip(uv[..., 1], 0.0, 1.0)) * (th - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tw - 1)
    y1 = jnp.minimum(y0 + 1, th - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    c = (
        tex[y0, x0] * (1 - wx) * (1 - wy)
        + tex[y0, x1] * wx * (1 - wy)
        + tex[y1, x0] * (1 - wx) * wy
        + tex[y1, x1] * wx * wy
    )
    return jnp.where(frag.valid[..., None], c, background)
