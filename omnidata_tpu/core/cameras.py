"""Camera models: intrinsics, extrinsics, projection, ray generation.

TPU-first reimplementation of the reference's camera math
(omnidata_annotator/scripts/io_utils.py:125-207, scripts/utils.py:84-144,
omnidata_tools/torch/dataloader/omnidata_dataset.py:565-594). Everything is
pure JAX and batched; conventions are centralized here (SURVEY.md §7 hard
part #6: Blender / CV / PyTorch3D conventions coexist in the reference).

Coordinate conventions
----------------------
- **World/Blender**: right-handed, Z up. A camera is (location, R) where R is
  the camera object's rotation; the camera looks down its local -Z, +Y up.
- **CV camera frame**: x right, y down, z forward (into the scene). Related
  to the Blender camera frame by ``R_bcam2cv = diag(1, -1, -1)``
  (io_utils.py:141-170).
- Pixel (u, v): u right, v down, origin at the top-left; the pixel grid is
  sampled at pixel centers (u + 0.5, v + 0.5).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .rotations import _mm, _norm, euler_xyz_to_matrix, quat_to_matrix

# Blender camera defaults used by the reference (settings.py:32-38, utils.py:84-88).
SENSOR_WIDTH_MM = 20.0
DEFAULT_RESOLUTION = 512

R_BCAM2CV = jnp.asarray([[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A batch of pinhole cameras (a pytree; ``resolution`` is static
    metadata so jitted renderers specialize on image size).

    location: (...,3) world-space position.
    R:        (...,3,3) object rotation (world-from-camera, Blender frame).
    fov:      (...) horizontal field of view in radians.
    resolution: static int, square images (the annotator renders square).
    """

    location: jax.Array
    R: jax.Array
    fov: jax.Array
    resolution: int = dataclasses.field(default=DEFAULT_RESOLUTION, metadata=dict(static=True))

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


def focal_px_from_fov(fov: jax.Array, resolution: int) -> jax.Array:
    """Focal length in pixels from horizontal FOV: f = (W/2) / tan(fov/2)."""
    return (resolution / 2.0) / jnp.tan(fov / 2.0)


def fov_from_focal_mm(f_mm: jax.Array, sensor_width_mm: float = SENSOR_WIDTH_MM) -> jax.Array:
    return 2.0 * jnp.arctan(sensor_width_mm / (2.0 * f_mm))


def focal_mm_from_fov(fov: jax.Array, sensor_width_mm: float = SENSOR_WIDTH_MM) -> jax.Array:
    return sensor_width_mm / (2.0 * jnp.tan(fov / 2.0))


def intrinsic_matrix(fov: jax.Array, resolution: int) -> jax.Array:
    """K (...,3,3) as the reference builds it (io_utils.py:173-207):
    f_px on both axes (square pixels), principal point at the image center."""
    f = focal_px_from_fov(fov, resolution)
    z = jnp.zeros_like(f)
    o = jnp.ones_like(f)
    c = jnp.full_like(f, resolution / 2.0)
    return jnp.stack(
        [
            jnp.stack([f, z, c], -1),
            jnp.stack([z, f, c], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def extrinsic_RT(location: jax.Array, R_obj: jax.Array) -> jax.Array:
    """World -> CV-camera 3x4 [R|t] (io_utils.py:141-170).

    R_world2cv = R_bcam2cv @ R_obj^T;  t = -R_world2cv @ location.
    """
    R_w2b = jnp.swapaxes(R_obj, -1, -2)
    R = _mm(R_BCAM2CV, R_w2b)
    t = -jnp.matmul(R, location[..., None], precision="highest")
    return jnp.concatenate([R, t], -1)


def project(K: jax.Array, RT: jax.Array, pts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project world points (...,N,3) -> pixel coords (...,N,2) and depth (...,N).

    Depth is the CV-camera z (positive in front of the camera). Matches
    get_2d_point_from_3d_point (io_utils.py:125-138).
    """
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    ph = jnp.concatenate([pts, ones], -1)
    cam = jnp.einsum("...ij,...nj->...ni", RT, ph, precision="highest")
    uvw = jnp.einsum("...ij,...nj->...ni", K, cam, precision="highest")
    uv = uvw[..., :2] / jnp.where(jnp.abs(uvw[..., 2:]) < 1e-12, 1e-12, uvw[..., 2:])
    return uv, cam[..., 2]


def camera_rays(camera: Camera) -> tuple[jax.Array, jax.Array]:
    """Per-pixel world-space ray origins and directions for a camera batch.

    Returns (origins (...,3) broadcastable, dirs (...,H,W,3) unit vectors).
    Pixel centers, u right / v down; matches the K/RT convention above so that
    projecting ``origin + t*dir`` lands back on pixel (u+0.5, v+0.5).
    """
    res = camera.resolution
    f = focal_px_from_fov(camera.fov, res)
    u = jnp.arange(res, dtype=jnp.float32) + 0.5
    v = jnp.arange(res, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # (H,W)
    c = res / 2.0
    # CV-camera-frame direction (x right, y down, z forward), then to Blender
    # camera frame via R_bcam2cv^T = R_bcam2cv, then to world via R_obj.
    x = (uu - c) / f[..., None, None]
    y = (vv - c) / f[..., None, None]
    ones = jnp.ones_like(x)
    d_cv = jnp.stack([x, y, ones], -1)  # (...,H,W,3)
    d_bcam = d_cv * jnp.asarray([1.0, -1.0, -1.0])
    d_world = jnp.einsum("...ij,...hwj->...hwi", camera.R, d_bcam, precision="highest")
    d_world = d_world / _norm(d_world)
    return camera.location, d_world


def look_at_rotation(location: jax.Array, target: jax.Array, up=None) -> jax.Array:
    """Rotation of a camera at ``location`` fixated on ``target``.

    Blender TRACK_TO with track axis -Z and up axis Y (what the reference's
    fixation constraint produces; validated against golden point_info:
    R @ [0,0,-1] == normalize(target - location)).
    """
    if up is None:
        up = jnp.asarray([0.0, 0.0, 1.0])
    fwd = target - location
    fwd = fwd / _norm(fwd)
    # camera -Z = fwd  =>  camera +Z = -fwd
    zaxis = -fwd
    xaxis = jnp.cross(jnp.broadcast_to(up, zaxis.shape), zaxis)
    xn = _norm(xaxis)
    # Degenerate (looking straight up/down): fall back to world X.
    xaxis = jnp.where(xn < 1e-8, jnp.asarray([1.0, 0.0, 0.0]), xaxis / jnp.where(xn < 1e-8, 1.0, xn))
    yaxis = jnp.cross(zaxis, xaxis)
    yaxis = yaxis / _norm(yaxis)
    return jnp.stack([xaxis, yaxis, zaxis], -1)  # columns are camera axes


def camera_from_view_dict(view: dict, resolution: int | None = None) -> Camera:
    """Build a Camera from a reference point_info view dict (io_utils.py:284-458)."""
    loc = jnp.asarray(view["camera_location"], jnp.float32)
    if "camera_rotation_final_quaternion" in view:
        R = quat_to_matrix(jnp.asarray(view["camera_rotation_final_quaternion"], jnp.float32))
    else:
        R = euler_xyz_to_matrix(jnp.asarray(view["camera_rotation_final"], jnp.float32))
    fov = jnp.asarray(view["field_of_view_rads"], jnp.float32)
    res = int(resolution or view.get("resolution", DEFAULT_RESOLUTION))
    return Camera(location=loc, R=R, fov=fov, resolution=res)


def unproject_depth(
    depth: jax.Array, fov: jax.Array, resolution: int, euclidean: bool = False
) -> jax.Array:
    """Depth (...,H,W) -> CV-camera-frame points (...,H,W,3).

    ``euclidean=False``: depth is z-buffer (distance along camera z).
    ``euclidean=True``: depth is ray length (the reference's depth_euclidean);
    matches unproject_metric_depth_euclidean (dataloader/pytorch3d_utils.py:121-150).
    """
    f = focal_px_from_fov(fov, resolution)
    u = jnp.arange(resolution, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    c = resolution / 2.0
    x = (uu - c) / f[..., None, None]
    y = (vv - c) / f[..., None, None]
    if euclidean:
        norm = jnp.sqrt(x * x + y * y + 1.0)
        z = depth / norm
    else:
        z = depth
    return jnp.stack([x * z, y * z, z], -1)


def decompose_KRT(P: "np.ndarray"):
    """Decompose a 3x4 projection P = K [R|t] into (K, R, t) via RQ with
    positive-diagonal normalization (create_images_utils.py:109-152
    get_KRT_from_P). Host-side numpy; K is scaled so K[2,2] = 1."""
    import numpy as np
    import scipy.linalg

    P = np.asarray(P, np.float64)
    M = P[:, :3]
    K, R = scipy.linalg.rq(M)
    # normalize: positive diagonal of K, det(R) = +1
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        K = -K
        R = -R
    t = np.linalg.solve(K, P[:, 3])
    K = K / K[2, 2]
    return K, R, t
