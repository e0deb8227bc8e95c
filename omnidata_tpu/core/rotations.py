"""Rotation math in the reference's (Blender) conventions, as pure JAX.

Conventions (validated numerically against the reference's golden point_info
JSONs, e.g. omnidata_annotator/assets/replica/point_47_view_25_domain_fixatedpose.json):

- Euler angles use Blender's 'XYZ' order: ``R = Rz(z) @ Ry(y) @ Rx(x)``
  (X rotation applied to the vector first).
- Quaternions are stored ``(w, x, y, z)``.
- ``Euler.rotate(delta)`` composes as ``R_new = R_delta @ R_old``.
- A camera looks down its local ``-Z`` with ``+Y`` up (Blender camera).

All functions are batched: they accept arrays whose leading dimensions are
batch dimensions and operate on the trailing ones, so they can be freely
``vmap``-ed / ``jit``-ed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp



def _norm(x, axis=-1, keepdims=True):
    """Float32-exact vector norm (jnp.linalg.norm lowers to a bf16 dot on TPU)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def _mm(a, b):
    """Small-matrix multiply at full float32 precision (TPU default is bf16)."""
    return jnp.matmul(a, b, precision="highest")


def rot_x(a: jax.Array) -> jax.Array:
    """Rotation about +X by angle ``a`` (radians). Batched over a's shape."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)],
        -2,
    )


def rot_y(a: jax.Array) -> jax.Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)],
        -2,
    )


def rot_z(a: jax.Array) -> jax.Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def euler_xyz_to_matrix(euler: jax.Array) -> jax.Array:
    """Blender 'XYZ'-order euler (...,3) -> rotation matrix (...,3,3)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    return _mm(rot_z(z), _mm(rot_y(y), rot_x(x)))


def matrix_to_euler_xyz(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> Blender 'XYZ' euler (...,3).

    R = Rz @ Ry @ Rx  =>  R[2,0] = -sin(y);  R[2,1] = cos(y) sin(x);
    R[2,2] = cos(y) cos(x);  R[1,0] = cos(y) sin(z);  R[0,0] = cos(y) cos(z).
    Gimbal-safe fallback at |cos y| ~ 0 (x set to 0 there, like mathutils).
    """
    sy = -R[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    y = jnp.arcsin(sy)
    cy = jnp.cos(y)
    safe = jnp.abs(cy) > 1e-6
    x = jnp.where(safe, jnp.arctan2(R[..., 2, 1], R[..., 2, 2]), 0.0)
    z = jnp.where(
        safe,
        jnp.arctan2(R[..., 1, 0], R[..., 0, 0]),
        jnp.arctan2(-R[..., 0, 1], R[..., 1, 1]),
    )
    return jnp.stack([x, y, z], -1)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (...,4) (w,x,y,z) -> rotation matrix (...,3,3)."""
    q = q / _norm(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> unit quaternion (...,4) (w,x,y,z), w >= 0.

    Branch-free Shepperd's method (all four candidates computed, the
    numerically best one selected with ``where``) — XLA-friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)

    scores = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], -2)  # (...,4,4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / _norm(q)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b of (w,x,y,z) quaternions; rotation a∘b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (...,3) by quaternion q (...,4)."""
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[..., :1] * t + jnp.cross(qv, t)


def euler_xyz_to_quat(euler: jax.Array) -> jax.Array:
    return matrix_to_quat(euler_xyz_to_matrix(euler))


def quat_to_euler_xyz(q: jax.Array) -> jax.Array:
    return matrix_to_euler_xyz(quat_to_matrix(q))


def rotate_euler(euler: jax.Array, delta_euler: jax.Array) -> jax.Array:
    """Blender ``Euler.rotate``: returns euler of ``R_delta @ R_euler``.

    Matches how the reference applies camera_rotation_from_original_to_final
    (omnidata_annotator/scripts/create_images_utils.py:208-210).
    """
    return matrix_to_euler_xyz(
        _mm(euler_xyz_to_matrix(delta_euler), euler_xyz_to_matrix(euler))
    )


def rotate_axis_x(euler: jax.Array, angle: float) -> jax.Array:
    """Blender ``Euler.rotate_axis('X', angle)``: rotation about the *local*
    X axis, i.e. ``R_new = R_old @ Rx(angle)``.

    The reference uses +pi/2 to "level the quaternion onto the plane images
    were taken at" (omnidata_annotator/scripts/io_utils.py:100-107).
    """
    a = jnp.asarray(angle)
    return matrix_to_euler_xyz(_mm(euler_xyz_to_matrix(euler), rot_x(a)))


def slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions.

    Used by the smooth-trajectory sampler (reference:
    generate_points_smooth_trajectory.py, scipy Slerp).
    """
    q0 = q0 / _norm(q0)
    q1 = q1 / _norm(q1)
    d = jnp.sum(q0 * q1, -1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-6
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / _norm(out)
