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
