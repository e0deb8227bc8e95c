"""omnidata-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of EPFL-VILAB/omnidata.

Subsystems (mirroring the reference's capability map, see SURVEY.md):

- ``core``      — camera/rotation math shared by every layer (reference:
                  omnidata_annotator/scripts/io_utils.py).
- ``mesh``      — HBM-resident triangle meshes, the batched rasterizer/raycaster
                  that replaces Blender's renderer.
- ``cues``      — per-view label generators (depth encodings, normals colors,
                  reshading, edges, keypoints, segmentation, curvature, ...).
- ``sampling``  — camera-pose and point-of-interest sampling
                  (reference: generate_camera_poses.py / generate_points.py).
- ``models``    — Flax DPT-hybrid-384 and UNet (reference: omnidata_tools/torch/modules).
- ``losses``    — MiDaS SSI-MAE, gradient matching, virtual-normal, masked losses.
- ``data``      — task configs, transforms, datasets, download tooling.
- ``augment``   — refocus (depth-of-field) + 2D augmentations.
- ``train``     — pjit data-parallel training loops.
- ``annotator`` — the end-to-end mesh -> labeled-views pipeline + CLI.
"""

__version__ = "0.1.0"
