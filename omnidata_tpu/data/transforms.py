"""Task -> array transforms (reference: omnidata_tools/torch/data/transforms.py:29-157).

Numpy/PIL host-side decode into float32 CHW arrays ready for device transfer
(the reference returns torch tensors; we return numpy with identical values):

- rgb/normal/reshading: 8-bit -> [0,1] float CHW
- 16-bit single channel (depths, edges, keypoints): /(2^16-1)
- principal_curvature: first 2 of 3 8-bit channels
- dense labels (segment_semantic/instance/fragments): int64 HW(C)
- clamp_to rescaling: x -> clip(x, 0, max)/max (e.g. depth 8000/65535,
  edge_texture 0.25)
- default_loader: .png (PIL), .hdf5 (hypersim semantics), .npy,
  .json (point_info; pops nonfixated, adds building)
"""
from __future__ import annotations

import json
import os

import numpy as np

from . import task_configs


def _to_chw(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img[None]
    return img.transpose(2, 0, 1)


def transform_8bit(img) -> np.ndarray:
    arr = np.asarray(img, np.float32) / 255.0
    return _to_chw(arr)


def transform_8bit_n_channel(n_channel: int = 1, crop_channels: bool = False):
    def fn(img):
        arr = transform_8bit(img)
        if crop_channels and arr.shape[0] > n_channel:
            arr = arr[:n_channel]
        return arr

    return fn


def transform_16bit_single_channel(img) -> np.ndarray:
    arr = np.asarray(img).astype(np.float32) / (2**16 - 1.0)
    return _to_chw(arr)


def transform_dense_labels(img) -> np.ndarray:
    return np.asarray(img).astype(np.int64)


def transform_fragment(img, move_last_row: bool = True) -> np.ndarray:
    """Reference fragment images (dataloader/transforms.py:103-115): RGB
    pngs used as opaque (H,W,3) face signatures; the official non-hypersim
    release stores the last COLUMN first, which the reference rotates back.
    Our own annotator writes raw int32 .npy face ids — ndarray inputs pass
    through untouched (no quirk to undo)."""
    if isinstance(img, np.ndarray):
        return img.astype(np.int64)
    arr = np.asarray(img)
    if move_last_row and arr.ndim == 3:
        arr = np.concatenate([arr[:, 1:], arr[:, 0][:, np.newaxis, :]], axis=1)
    return arr.astype(np.int64)


def transform_mask_valid(img) -> np.ndarray:
    arr = np.asarray(img, np.float32)
    if arr.max() > 1:
        arr = arr / 255.0
    return _to_chw(arr)


def _rescale_0_max(maxx: float):
    def fn(arr):
        return np.clip(arr, 0.0, maxx) / maxx

    return fn


def _resize(img, image_size: int, method: str):
    from PIL import Image

    if isinstance(img, np.ndarray):
        if img.ndim != 2:
            return img  # npy feature arrays: resizing handled upstream
        # 2D dense-label arrays (hypersim HDF5 semantics): nearest short-side
        # resize so the joint square crop sees the SAME scale as the other
        # tasks (leaving them full-res misaligns every crop)
        h, w = img.shape
        if min(h, w) == image_size:
            return img
        if w < h:
            nw, nh = image_size, int(round(h * image_size / w))
        else:
            nw, nh = int(round(w * image_size / h)), image_size
        pil = Image.fromarray(img.astype(np.int32), mode="I")
        return np.asarray(pil.resize((nw, nh), Image.NEAREST)).astype(img.dtype)
    m = Image.BILINEAR if method == "bilinear" else Image.NEAREST
    w, h = img.size
    if min(w, h) == image_size:
        return img
    if w < h:
        return img.resize((image_size, int(round(h * image_size / w))), m)
    return img.resize((int(round(w * image_size / h)), image_size), m)


def get_transform(task: str, image_size: int | None = None):
    """Callable PIL-or-array -> float32 numpy in the reference's convention.

    Curvature keeps its first 2 channels; 16-bit tasks are scaled by 1/65535;
    clamp_to tasks are rescaled to [0,1] by their max; rgb resizes bilinear,
    everything else nearest (transforms.py:76-78)."""
    if task in ("rgb", "normal", "reshading"):
        base = transform_8bit
    elif task == "mask_valid":
        base = transform_mask_valid
    elif task in ("keypoints2d", "keypoints3d", "depth_euclidean",
                  "depth_zbuffer", "edge_texture", "edge_occlusion"):
        base = transform_16bit_single_channel
    elif task in ("principal_curvature", "curvature"):
        base = transform_8bit_n_channel(2, crop_channels=True)
    elif task == "fragments":
        base = transform_fragment
    elif task in ("semantic", "segment_semantic", "segment_instance",
                  "segment_panoptic", "segment_unsup2d", "segment_unsup25d"):
        base = transform_dense_labels
    elif task in ("class_object", "class_scene"):
        base = lambda x: np.asarray(x, np.float32)
        image_size = None
    elif task in ("mesh", "point_info"):
        return None
    else:
        raise NotImplementedError(f"Unknown transform for task {task}")

    steps = [base]
    params = task_configs.task_parameters.get(task, {})
    if "clamp_to" in params:
        minn, maxx = params["clamp_to"]
        if minn > 0:
            raise NotImplementedError("nonzero clamp minimum")
        steps.append(_rescale_0_max(maxx))

    def transform(img):
        if image_size is not None:
            img = _resize(img, image_size, "bilinear" if task == "rgb" else "nearest")
        out = img
        for s in steps:
            out = s(out)
        return out

    return transform


def default_loader(path: str):
    """png/hdf5/npy/json loader (transforms.py:124-147)."""
    if path.endswith(".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            return np.asarray(f["dataset"][:])  # raw ids (hypersim NYU40
            # semantics are int16 with -1 = undefined; do not quantize)
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".json"):
        with open(path) as f:
            d = json.load(f)
        d["building"] = os.path.basename(os.path.dirname(path))
        d.pop("nonfixated_points_in_view", None)
        return d
    from PIL import Image

    with open(path, "rb") as f:
        img = Image.open(f)
        img.load()
    return img
