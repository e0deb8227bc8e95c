"""Component-specific dataset pipelines, proven on synthetic fixtures laid
out exactly like the real components (VERDICT: hypersim end-to-end —
reference dataloader/component_datasets/hypersim/__init__.py:60-250)."""
import os

import numpy as np
import pytest

from omnidata_tpu.data.components import make_component_dataset
from omnidata_tpu.data.hypersim import (
    CLASS_LABEL_TRANSFORM,
    COORD_TRANSFORM,
    hypersim_pose,
)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


@pytest.fixture()
def hypersim_root(tmp_path):
    import h5py
    from PIL import Image

    building = "ai_001_001-cam_00"
    b = tmp_path / building
    for task in ("rgb", "normal", "depth_zbuffer", "semantic"):
        (b / task).mkdir(parents=True)

    H, W = 48, 64  # hypersim frames are 4:3 non-square
    rng = np.random.RandomState(0)
    n_world = np.array([0.6, 0.0, 0.8])  # unit, easy to track
    normal_png = np.zeros((H, W, 3), np.uint8)
    normal_png[..., :] = np.round((n_world + 1) / 2 * 255).astype(np.uint8)

    sem = np.full((H, W), -1, np.int16)
    sem[:, : W // 2] = 1   # wall
    sem[:, W // 2 :] = 2   # floor

    for frame in (0, 1):
        p = str(frame)
        Image.fromarray(
            (rng.rand(H, W, 3) * 255).astype(np.uint8)
        ).save(b / "rgb" / f"point_{p}_view_0_domain_rgb.png")
        Image.fromarray(normal_png).save(
            b / "normal" / f"point_{p}_view_0_domain_normal.png"
        )
        Image.fromarray(
            (rng.rand(H, W) * 60000).astype(np.uint16)
        ).save(b / "depth_zbuffer" / f"point_{p}_view_0_domain_depth_zbuffer.png")
        with h5py.File(
            b / "semantic" / f"point_{p}_view_0_domain_semantic.hdf5", "w"
        ) as f:
            f["dataset"] = sem

    # metadata: camera keyframes + intrinsics csv
    meta = tmp_path / "_hypersim_meta"
    kf = meta / "camera_keyframe" / building
    kf.mkdir(parents=True)
    positions = np.stack([[10.0, 0.0, 5.0], [0.0, 20.0, 5.0]])
    orientations = np.stack([_rot_z(0.3), _rot_z(1.2)])
    with h5py.File(kf / "camera_keyframe_positions.hdf5", "w") as f:
        f["dataset"] = positions
    with h5py.File(kf / "camera_keyframe_orientations.hdf5", "w") as f:
        f["dataset"] = orientations

    mproj = np.diag([1.5, 2.0, -1.0, 1.0])
    muv = np.diag([0.9, 1.1, 1.0])
    cols = ["scene_name", "settings_output_img_width",
            "settings_output_img_height", "settings_units_info_meters_scale"]
    vals = ["ai_001_001", str(W), str(H), "0.02"]
    for i in range(4):
        for j in range(4):
            cols.append(f"M_proj_{i}{j}")
            vals.append(str(mproj[i, j]))
    for i in range(3):
        for j in range(3):
            cols.append(f"M_cam_from_uv_{i}{j}")
            vals.append(str(muv[i, j]))
    (meta / "metadata_camera_parameters.csv").write_text(
        ",".join(cols) + "\n" + ",".join(vals) + "\n"
    )
    return tmp_path, building, n_world, positions, orientations, mproj, muv


def test_hypersim_end_to_end(hypersim_root):
    root, building, n_world, positions, orientations, mproj, muv = hypersim_root
    ds = make_component_dataset(
        "hypersim", str(root),
        tasks=("rgb", "normal", "depth_zbuffer", "semantic"),
        image_size=32, random_flip=False,
    )
    assert len(ds) == 2
    sample = ds[0]
    frame = int(sample["point"])

    # --- square crop of the 4:3 source (random_crop component) ---
    assert sample["rgb"].shape == (3, 32, 32)
    assert sample["normal"].shape == (3, 32, 32)

    # --- world -> cam normals: n_cam = R_mesh^T n_world ---
    R_mesh = COORD_TRANSFORM @ orientations[frame] @ COORD_TRANSFORM.T
    want = R_mesh.T @ n_world
    got = sample["normal"][:, 16, 16] * 2.0 - 1.0
    np.testing.assert_allclose(got, want, atol=0.02)  # 8-bit quantization

    # --- NYU40 -> taskonomy label remap, undefined -> 0 ---
    sem = sample["semantic"]
    assert set(np.unique(sem)) <= {0, CLASS_LABEL_TRANSFORM[1],
                                   CLASS_LABEL_TRANSFORM[2]}
    assert (sem == CLASS_LABEL_TRANSFORM[1]).any()
    assert (sem == CLASS_LABEL_TRANSFORM[2]).any()

    # --- pose tensors from keyframes + csv ---
    np.testing.assert_allclose(sample["cam_to_world_R"], R_mesh, atol=1e-6)
    want_T = COORD_TRANSFORM @ (-(orientations[frame].T @ positions[frame]) * 0.02)
    np.testing.assert_allclose(sample["cam_to_world_T"], want_T, atol=1e-6)
    assert sample["proj_K"].shape == (4, 4)
    assert sample["proj_K_inv"].shape == (3, 3)


def test_hypersim_pose_matrix_chain():
    """proj_K folds the aspect/crop/convention transforms around M_proj."""
    meta = {
        "meters_per_asset_unit": 1.0,
        "M_proj": np.diag([1.0, 1.0, -1.0, 1.0]),
        "M_cam_from_uv": np.eye(3),
    }
    pose = hypersim_pose(
        np.zeros((1, 3)), np.eye(3)[None], meta, 0
    )
    # x gains (4/3)^2 (aspect x crop-to-square), y unchanged
    assert abs(pose["proj_K"][0, 0]) == pytest.approx((4 / 3) ** 2)
    assert abs(pose["proj_K"][1, 1]) == pytest.approx(1.0)
    # K_inv undoes the crop on x
    assert abs(pose["proj_K_inv"][0, 0]) == pytest.approx(0.75)
