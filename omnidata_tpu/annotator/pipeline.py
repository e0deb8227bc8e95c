"""The device-side annotation pipeline: one fused jitted program per camera
batch that emits every label image the reference generates with separate
Blender/skimage passes (SURVEY.md §3.2 — the per-modality subprocesses
collapse into a single XLA computation over shared Fragments).

Modalities produced on device per view:
  depth_zbuffer (u16) · depth_euclidean (u16) · mask_valid (u8) ·
  normal (u8 RGB) · reshading (u8) · rgb (u8, vertex colors) ·
  principal_curvature (u8 RG, from baked vertex colors) ·
  edge_occlusion (u16) · edge_texture (u16) · keypoints2d (u16)

Host-side modalities (segment_unsup2d/25d, keypoints3d/NARF) plug in after
device decode; see cues.segmentation / cues.keypoints3d.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, camera_rays
from ..cues.edges import edge_occlusion, edge_texture
from ..mesh.raster import render_views_fused
from ..cues.encode import (
    encode_depth_16bit,
    encode_normals_color,
    img_as_uint8,
    img_as_uint16,
    mask_valid_image,
)
from ..cues.keypoints2d import keypoints2d
from ..cues.reshading import reshade
from ..mesh.mesh import TriangleMesh
from ..mesh.raster import render_view, render_view_pallas
from ..mesh.shade import (
    face_flat_colors,
    face_labels,
    normals_to_camera,
    smooth_normals_world,
    textured_colors,
    vertex_colors,
)

def _sample_texture(uv, tex, valid):
    """Bilinear texture sample of interpolated uvs (shade.textured_colors
    formula, from kernel-interpolated uvs)."""
    th, tw = tex.shape[0], tex.shape[1]
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
    return jnp.where(valid[..., None], c, 0.0)


DEVICE_MODALITIES = (
    "depth_zbuffer",
    "depth_euclidean",
    "mask_valid",
    "normal",
    "reshading",
    "rgb",
    "principal_curvature",
    "edge_occlusion",
    "edge_texture",
    "keypoints2d",
    "semantic",
    "fragments",
)


@partial(
    jax.jit,
    static_argnames=("tile", "cap", "chunk", "parallel_tiles", "modalities",
                     "use_pallas", "fused_attrs", "keypoint_blur_sigma"),
)
def annotate_view(
    camera: Camera,
    mesh: TriangleMesh,
    curvature_mesh: TriangleMesh | None = None,
    tile: int = 64,
    cap: int = 1024,
    chunk: int = 128,
    parallel_tiles: bool = False,
    modalities: tuple = DEVICE_MODALITIES,
    use_pallas: bool | None = None,
    fused_attrs: bool = False,
    keypoint_blur_sigma: float = 0.0,
) -> dict[str, jax.Array]:
    """Render one view and produce all requested device modalities.

    curvature_mesh: same geometry with curvature RG vertex colors baked
    (cues.curvature.bake_curvature_colors) — shares the Fragments.
    use_pallas: None = auto (Pallas kernel on TPU, XLA elsewhere)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    needs_normals = "normal" in modalities or "reshading" in modalities
    needs_rgb = any(m in modalities for m in ("rgb", "edge_texture", "keypoints2d"))
    has_colors = mesh.vertex_colors is not None
    has_texture = mesh.texture is not None and mesh.vertex_uvs is not None

    # In-kernel attribute interpolation is available but measured SLOWER than
    # the shade path on v5e (extra attr planes + outputs raise VMEM pressure,
    # forcing smaller pixel blocks): 23.7 vs 37.7 viewpoints/s on the bench
    # scene. Kept opt-in for dense-candidate meshes where it may win.
    attr_img = None
    attr_slices: dict[str, Any] = {}
    if use_pallas and fused_attrs:
        # fuse attribute interpolation into the kernel's winner extraction
        vertex_attrs, attr_slices = _gather_attrs(mesh, curvature_mesh, modalities)
        if vertex_attrs is not None:
            frag, attr_img = render_view_pallas(
                camera, mesh, tile, cap, chunk, vertex_attrs=vertex_attrs
            )
        else:
            frag = render_view_pallas(camera, mesh, tile, cap, chunk)
    elif use_pallas:
        frag = render_view_pallas(camera, mesh, tile, cap, chunk)
    else:
        frag = render_view(camera, mesh, tile, cap, chunk, parallel_tiles)
    out: dict[str, Any] = {}

    if "depth_zbuffer" in modalities or "edge_occlusion" in modalities:
        zcode = encode_depth_16bit(frag.z, frag.valid)
        out["depth_zbuffer"] = zcode
    if "depth_euclidean" in modalities:
        out["depth_euclidean"] = encode_depth_16bit(frag.t, frag.valid)
    if "mask_valid" in modalities:
        out["mask_valid"] = mask_valid_image(frag.valid)

    if needs_normals and attr_img is not None:
        n = attr_img[..., attr_slices["normal"]]
        norm = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
        n_world = n / jnp.maximum(norm, 1e-12)
    elif needs_normals:
        n_world = smooth_normals_world(frag, mesh)
    if "normal" in modalities:
        n_cam = normals_to_camera(n_world, camera)
        out["normal"] = img_as_uint8(encode_normals_color(n_cam, frag.valid))
    if "reshading" in modalities:
        _, dirs = camera_rays(camera)
        out["reshading"] = img_as_uint8(reshade(frag.t, n_world, dirs, frag.valid))

    has_face_colors = mesh.face_colors is not None
    if needs_rgb and (has_colors or has_texture or has_face_colors):
        if attr_img is not None and "uv" in attr_slices:
            rgb = _sample_texture(
                attr_img[..., attr_slices["uv"]], mesh.texture, frag.valid
            )
        elif attr_img is not None and "rgb" in attr_slices:
            rgb = jnp.where(
                frag.valid[..., None],
                jnp.clip(attr_img[..., attr_slices["rgb"]], 0.0, 1.0), 0.0,
            )
        elif has_texture:
            rgb = textured_colors(frag, mesh)
        elif has_colors:
            rgb = vertex_colors(frag, mesh)
        else:  # obj+mtl per-face materials (create_rgb_images_obj_mtl.py)
            rgb = face_flat_colors(frag, mesh)
        if "rgb" in modalities:
            out["rgb"] = img_as_uint8(rgb)
        gray = jnp.mean(rgb, -1)
        if "edge_texture" in modalities:
            out["edge_texture"] = img_as_uint16(edge_texture(gray, sigma=3.0))
        if "keypoints2d" in modalities:
            kg = gray
            if keypoint_blur_sigma > 0:  # KEYPOINT_BLUR_RADIUS preprocessing
                from ..cues.edges import gaussian_blur_constant

                kg = gaussian_blur_constant(kg, keypoint_blur_sigma)
            out["keypoints2d"] = img_as_uint16(jnp.clip(keypoints2d(kg), 0.0, 1.0))

    if "principal_curvature" in modalities and curvature_mesh is not None:
        if attr_img is not None and "curv" in attr_slices:
            cc = jnp.where(
                frag.valid[..., None],
                jnp.clip(attr_img[..., attr_slices["curv"]], 0.0, 1.0), 0.0,
            )
            out["principal_curvature"] = img_as_uint8(cc)
        else:
            out["principal_curvature"] = img_as_uint8(
                vertex_colors(frag, curvature_mesh)
            )

    if "fragments" in modalities:
        # face-id image (reference 'fragments' domain: RGB-packed face ids,
        # dataloader/transforms.py transform_fragment) — we emit int32 directly
        out["fragments"] = frag.face.astype(jnp.int32)

    if "semantic" in modalities and mesh.face_labels is not None:
        out["semantic"] = face_labels(frag, mesh, background=0).astype(jnp.uint8)

    if "edge_occlusion" in modalities:
        out["edge_occlusion"] = img_as_uint16(edge_occlusion(out["depth_zbuffer"]))
        if "depth_zbuffer" not in modalities:
            del out["depth_zbuffer"]

    return out


def _gather_attrs(mesh, curvature_mesh, modalities):
    """Vertex-attribute columns to interpolate in-kernel + their slices."""
    needs_normals = "normal" in modalities or "reshading" in modalities
    needs_rgb = any(m in modalities for m in ("rgb", "edge_texture", "keypoints2d"))
    has_colors = mesh.vertex_colors is not None
    has_texture = mesh.texture is not None and mesh.vertex_uvs is not None
    cols, attr_slices = [], {}

    def add(name, a):
        start = sum(c.shape[1] for c in cols)
        attr_slices[name] = slice(start, start + a.shape[1])
        cols.append(a)

    if needs_normals:
        add("normal", mesh.vertex_normals)
    if needs_rgb and has_texture:
        add("uv", mesh.vertex_uvs)
    elif needs_rgb and has_colors:
        add("rgb", mesh.vertex_colors)
    if "principal_curvature" in modalities and curvature_mesh is not None:
        add("curv", curvature_mesh.vertex_colors)
    vertex_attrs = jnp.concatenate(cols, -1) if cols else None
    return vertex_attrs, attr_slices


@partial(
    jax.jit,
    static_argnames=("tile", "cap", "chunk", "modalities", "interpret",
                     "keypoint_blur_sigma", "ccap", "streamed"),
)
def annotate_views(
    cameras: Camera,
    mesh: TriangleMesh,
    curvature_mesh: TriangleMesh | None = None,
    tile: int = 64,
    cap: int = 1024,
    chunk: int = 128,
    modalities: tuple = DEVICE_MODALITIES,
    interpret: bool = False,
    keypoint_blur_sigma: float = 0.0,
    ccap: int | None = None,
    streamed: bool = False,
) -> dict[str, jax.Array]:
    """Batched annotation: K cameras -> all modalities as (K, H, W, ...)
    arrays in ONE jitted program.

    This is the throughput path (bench.py): one Pallas dispatch rasterizes
    all K views (grid K*T tiles) with in-kernel attribute interpolation, and
    the cue stack runs batched (convolutions and elementwise cues fill the
    VPU far better at batch K than per-view). cameras carries a leading
    batch dim on location/R/fov."""
    needs_normals = "normal" in modalities or "reshading" in modalities
    needs_rgb = any(m in modalities for m in ("rgb", "edge_texture", "keypoints2d"))
    has_colors = mesh.vertex_colors is not None
    has_texture = mesh.texture is not None and mesh.vertex_uvs is not None

    vertex_attrs, attr_slices = _gather_attrs(mesh, curvature_mesh, modalities)
    if vertex_attrs is not None:
        frag, attr_img = render_views_fused(
            cameras, mesh, tile, cap, chunk, interpret, vertex_attrs,
            ccap=ccap, streamed=streamed,
        )
    else:
        frag = render_views_fused(cameras, mesh, tile, cap, chunk, interpret,
                                  ccap=ccap, streamed=streamed)
        attr_img = None

    out: dict[str, Any] = {}
    if "depth_zbuffer" in modalities or "edge_occlusion" in modalities:
        out["depth_zbuffer"] = jax.vmap(encode_depth_16bit)(frag.z, frag.valid)
    if "depth_euclidean" in modalities:
        out["depth_euclidean"] = jax.vmap(encode_depth_16bit)(frag.t, frag.valid)
    if "mask_valid" in modalities:
        out["mask_valid"] = jax.vmap(mask_valid_image)(frag.valid)

    if needs_normals:
        n = attr_img[..., attr_slices["normal"]]
        norm = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
        n_world = n / jnp.maximum(norm, 1e-12)
    if "normal" in modalities:
        n_cam = jnp.einsum("kji,khwj->khwi", cameras.R, n_world,
                           precision="highest")
        out["normal"] = img_as_uint8(
            jax.vmap(encode_normals_color)(n_cam, frag.valid))
    if "reshading" in modalities:
        def rays_one(loc, R, fov):
            return camera_rays(Camera(loc, R, fov, cameras.resolution))[1]
        dirs = jax.vmap(rays_one)(cameras.location, cameras.R, cameras.fov)
        out["reshading"] = img_as_uint8(
            jax.vmap(reshade)(frag.t, n_world, dirs, frag.valid))

    has_face_colors = mesh.face_colors is not None
    if needs_rgb and (has_colors or has_texture or has_face_colors):
        if "uv" in attr_slices:
            rgb = jax.vmap(lambda uv, valid: _sample_texture(uv, mesh.texture, valid))(
                attr_img[..., attr_slices["uv"]], frag.valid
            )
        elif "rgb" in attr_slices:
            rgb = jnp.where(
                frag.valid[..., None],
                jnp.clip(attr_img[..., attr_slices["rgb"]], 0.0, 1.0), 0.0,
            )
        else:  # per-face material colors: plain XLA gather on face ids
            rgb = jnp.where(
                frag.valid[..., None],
                mesh.face_colors[jnp.maximum(frag.face, 0)], 0.0,
            )
        if "rgb" in modalities:
            out["rgb"] = img_as_uint8(rgb)
        gray = jnp.mean(rgb, -1)
        if "edge_texture" in modalities:
            out["edge_texture"] = img_as_uint16(
                jax.vmap(lambda g: edge_texture(g, sigma=3.0))(gray))
        if "keypoints2d" in modalities:
            kg = gray
            if keypoint_blur_sigma > 0:  # KEYPOINT_BLUR_RADIUS preprocessing
                from ..cues.edges import gaussian_blur_constant

                kg = jax.vmap(
                    lambda g: gaussian_blur_constant(g, keypoint_blur_sigma)
                )(kg)
            out["keypoints2d"] = img_as_uint16(
                jnp.clip(jax.vmap(keypoints2d)(kg), 0.0, 1.0))

    if "principal_curvature" in modalities and curvature_mesh is not None:
        cc = jnp.where(
            frag.valid[..., None],
            jnp.clip(attr_img[..., attr_slices["curv"]], 0.0, 1.0), 0.0,
        )
        out["principal_curvature"] = img_as_uint8(cc)

    if "fragments" in modalities:
        out["fragments"] = frag.face.astype(jnp.int32)

    if "semantic" in modalities and mesh.face_labels is not None:
        lab = mesh.face_labels[jnp.maximum(frag.face, 0)]
        out["semantic"] = jnp.where(frag.valid, lab, 0).astype(jnp.uint8)

    if "edge_occlusion" in modalities:
        out["edge_occlusion"] = img_as_uint16(
            jax.vmap(edge_occlusion)(out["depth_zbuffer"]))
        if "depth_zbuffer" not in modalities:
            del out["depth_zbuffer"]

    return out
