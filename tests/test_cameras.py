"""Golden tests for core camera/rotation math against the reference's
recorded point_info JSONs (omnidata_annotator/assets/*/point_*_domain_*.json)."""
import json

import jax.numpy as jnp
import numpy as np
import pytest

from omnidata_tpu.core import (
    Camera,
    camera_from_view_dict,
    camera_rays,
    euler_xyz_to_matrix,
    euler_xyz_to_quat,
    extrinsic_RT,
    intrinsic_matrix,
    look_at_rotation,
    matrix_to_euler_xyz,
    matrix_to_quat,
    project,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
    rotate_euler,
    slerp,
    unproject_depth,
)

GOLDEN = "omnidata_annotator/assets/replica/point_47_view_25_domain_fixatedpose.json"


@pytest.fixture(scope="module")
def view(reference_root):
    return json.load(open(reference_root / GOLDEN))


def test_euler_quat_roundtrip(view):
    e_final = jnp.asarray(view["camera_rotation_final"])
    q_final = jnp.asarray(view["camera_rotation_final_quaternion"])
    R_e = euler_xyz_to_matrix(e_final)
    R_q = quat_to_matrix(q_final)
    np.testing.assert_allclose(R_e, R_q, atol=1e-5)
    # matrix -> quat matches stored quaternion up to sign
    q = matrix_to_quat(R_e)
    sign = jnp.sign(jnp.sum(q * q_final))
    np.testing.assert_allclose(sign * q, q_final, atol=1e-5)
    # euler roundtrip
    np.testing.assert_allclose(
        euler_xyz_to_matrix(matrix_to_euler_xyz(R_e)), R_e, atol=1e-6
    )


def test_rotate_euler_composition(view):
    e_orig = jnp.asarray(view["camera_rotation_original"])
    e_delta = jnp.asarray(view["camera_rotation_from_original_to_final"])
    e_final = jnp.asarray(view["camera_rotation_final"])
    got = euler_xyz_to_matrix(rotate_euler(e_orig, e_delta))
    np.testing.assert_allclose(got, euler_xyz_to_matrix(e_final), atol=1e-5)


def test_fixation_look_at(view):
    cam = jnp.asarray(view["camera_location"])
    pt = jnp.asarray(view["point_location"])
    R_final = quat_to_matrix(jnp.asarray(view["camera_rotation_final_quaternion"]))
    fwd = (pt - cam) / jnp.linalg.norm(pt - cam)
    # camera -Z points at target
    np.testing.assert_allclose(R_final @ jnp.asarray([0.0, 0, -1]), fwd, atol=1e-4)
    # our look_at produces a rotation whose -Z also hits the target
    R_la = look_at_rotation(cam, pt)
    np.testing.assert_allclose(R_la @ jnp.asarray([0.0, 0, -1]), fwd, atol=1e-5)
    # camera distance matches
    np.testing.assert_allclose(
        jnp.linalg.norm(pt - cam), view["camera_distance"], rtol=1e-5
    )


def test_obliqueness(view):
    cam = jnp.asarray(view["camera_location"])
    pt = jnp.asarray(view["point_location"])
    n = jnp.asarray(view["point_normal"])
    fwd = (pt - cam) / jnp.linalg.norm(pt - cam)
    obl = jnp.arccos(jnp.clip(jnp.dot(-fwd, n), -1, 1))
    np.testing.assert_allclose(obl, view["obliqueness_angle"], atol=1e-4)


def test_projection_of_fixated_point_is_image_center(view):
    camera = camera_from_view_dict(view)
    K = intrinsic_matrix(camera.fov, camera.resolution)
    RT = extrinsic_RT(camera.location, camera.R)
    pt = jnp.asarray(view["point_location"])[None]
    uv, depth = project(K, RT, pt)
    c = camera.resolution / 2.0
    np.testing.assert_allclose(uv[0], jnp.asarray([c, c]), atol=0.5)
    np.testing.assert_allclose(depth[0], view["camera_distance"], rtol=1e-4)


def test_camera_rays_project_back(view):
    camera = camera_from_view_dict(view, resolution=64)
    origin, dirs = camera_rays(camera)
    K = intrinsic_matrix(camera.fov, camera.resolution)
    RT = extrinsic_RT(camera.location, camera.R)
    # take a few pixels, march along the ray, project back
    for (v, u) in [(0, 0), (10, 50), (63, 63), (32, 32)]:
        p = origin + 2.5 * dirs[v, u]
        uv, depth = project(K, RT, p[None])
        np.testing.assert_allclose(uv[0], jnp.asarray([u + 0.5, v + 0.5]), atol=1e-3)
        assert depth[0] > 0


def test_unproject_depth_consistency(view):
    # z-buffer unprojection: a constant-depth plane has z == depth everywhere
    res = 16
    fov = jnp.asarray(1.0)
    d = jnp.full((res, res), 2.0)
    pts = unproject_depth(d, fov, res, euclidean=False)
    np.testing.assert_allclose(pts[..., 2], 2.0, atol=1e-6)
    # euclidean unprojection: norm of point == depth
    pts_e = unproject_depth(d, fov, res, euclidean=True)
    np.testing.assert_allclose(jnp.linalg.norm(pts_e, axis=-1), 2.0, atol=1e-5)


def test_quat_helpers():
    rng = np.random.RandomState(0)
    e1 = jnp.asarray(rng.uniform(-np.pi, np.pi, 3))
    e2 = jnp.asarray(rng.uniform(-np.pi, np.pi, 3))
    q1, q2 = euler_xyz_to_quat(e1), euler_xyz_to_quat(e2)
    R1, R2 = euler_xyz_to_matrix(e1), euler_xyz_to_matrix(e2)
    np.testing.assert_allclose(
        quat_to_matrix(quat_multiply(q1, q2)), R1 @ R2, atol=1e-5
    )
    v = jnp.asarray(rng.uniform(-1, 1, 3))
    np.testing.assert_allclose(quat_rotate(q1, v), R1 @ v, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = euler_xyz_to_quat(jnp.asarray([0.0, 0.0, 0.0]))
    q1 = euler_xyz_to_quat(jnp.asarray([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(slerp(q0, q1, 0.0), q0, atol=1e-6)
    np.testing.assert_allclose(slerp(q0, q1, 1.0), q1, atol=1e-6)
    mid = slerp(q0, q1, 0.5)
    expect = euler_xyz_to_quat(jnp.asarray([0.0, 0.0, np.pi / 4]))
    np.testing.assert_allclose(jnp.abs(jnp.sum(mid * expect)), 1.0, atol=1e-6)


def test_batched_shapes():
    loc = jnp.zeros((5, 3))
    R = jnp.broadcast_to(jnp.eye(3), (5, 3, 3))
    fov = jnp.full((5,), 1.0)
    K = intrinsic_matrix(fov, 128)
    assert K.shape == (5, 3, 3)
    RT = extrinsic_RT(loc, R)
    assert RT.shape == (5, 3, 4)
    pts = jnp.ones((5, 7, 3))
    uv, z = project(K, RT, pts)
    assert uv.shape == (5, 7, 2) and z.shape == (5, 7)


def test_decompose_KRT_roundtrip():
    """RQ decomposition of P = K [R|t] recovers our intrinsics/extrinsics
    (the reference's get_KRT_from_P, create_images_utils.py:109-152)."""
    from omnidata_tpu.core.cameras import (
        decompose_KRT, extrinsic_RT, intrinsic_matrix,
    )

    loc = jnp.asarray([1.0, -2.0, 1.5])
    R_obj = look_at_rotation(loc, jnp.asarray([0.5, 0.5, 0.8]))
    K = np.asarray(intrinsic_matrix(jnp.asarray(0.9), 512), np.float64)
    RT = np.asarray(extrinsic_RT(loc, R_obj), np.float64)
    P = K @ RT
    K2, R2, t2 = decompose_KRT(P)
    np.testing.assert_allclose(K2, K, atol=1e-6)
    np.testing.assert_allclose(R2, RT[:, :3], atol=1e-6)
    np.testing.assert_allclose(t2, RT[:, 3], atol=1e-6)
