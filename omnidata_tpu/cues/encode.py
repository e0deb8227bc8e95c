"""Label encodings — the reference's compositor/PNG conventions.

Depth: 16-bit with sensitivity max_m / 2^16 (1/512 m at the default 128 m;
settings.py:86-89,155-156); invalid pixels saturate to 65535.
mask_valid: 255 * (1 - (depth==65535)) (create_mask_valid.py:18-29).
Normals: camera-space n -> (0.5 - 0.5nx, 0.5 + 0.5ny, 0.5 + 0.5nz) — the
multiply/add-grey remap with the R channel inverted
(create_normal_images.py:110-173).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_MAX_METERS = 128.0
U16_MAX = 65535


def encode_depth_16bit(depth_m: jax.Array, valid: jax.Array,
                       max_meters: float = DEPTH_MAX_METERS) -> jax.Array:
    """Metric depth (...,H,W) -> uint16 codes; invalid -> 65535.

    Matches Blender MapValue(size=1/max) -> clamp [0,1] -> 16-bit BW PNG."""
    code = jnp.round(jnp.clip(depth_m / max_meters, 0.0, 1.0) * U16_MAX)
    return jnp.where(valid, code, U16_MAX).astype(jnp.uint16)


def decode_depth_16bit(code: jax.Array, max_meters: float = DEPTH_MAX_METERS):
    """uint16 -> (depth_m, valid). Sentinel 65535 = invalid."""
    valid = code != U16_MAX
    return code.astype(jnp.float32) * (max_meters / U16_MAX), valid


def mask_valid_image(valid: jax.Array) -> jax.Array:
    """Boolean valid mask -> 8-bit mask image (255 valid / 0 invalid)."""
    return jnp.where(valid, 255, 0).astype(jnp.uint8)


def encode_normals_color(n_cam: jax.Array, valid: jax.Array | None = None) -> jax.Array:
    """Camera-frame unit normals (...,3) -> float colors in [0,1].

    R channel inverted (X flip), as the reference's compositor does."""
    col = jnp.stack(
        [
            0.5 - 0.5 * n_cam[..., 0],
            0.5 + 0.5 * n_cam[..., 1],
            0.5 + 0.5 * n_cam[..., 2],
        ],
        -1,
    )
    col = jnp.clip(col, 0.0, 1.0)
    if valid is not None:
        # Blender renders background as the horizon color; the reference's
        # normal images use mid-grey-ish sky — we emit 0.5 grey for no-hit.
        col = jnp.where(valid[..., None], col, 0.5)
    return col


def decode_normals_color(col: jax.Array) -> jax.Array:
    """Inverse of encode_normals_color (colors in [0,1] -> camera normals)."""
    n = jnp.stack(
        [
            -(2.0 * col[..., 0] - 1.0),
            2.0 * col[..., 1] - 1.0,
            2.0 * col[..., 2] - 1.0,
        ],
        -1,
    )
    norm = jnp.sqrt(jnp.sum(n * n, -1, keepdims=True))
    return n / jnp.maximum(norm, 1e-12)


def img_as_uint16(x: jax.Array) -> jax.Array:
    """skimage.img_as_uint for floats in [0,1]: round(x * 65535)."""
    return jnp.round(jnp.clip(x, 0.0, 1.0) * U16_MAX).astype(jnp.uint16)


def img_as_uint8(x: jax.Array) -> jax.Array:
    return jnp.round(jnp.clip(x, 0.0, 1.0) * 255).astype(jnp.uint8)


# -------- host-side PNG IO (PIL; 16-bit capable) ---------------------------

def save_png(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(arr)
    # Pillow >= 10 infers I;16 from uint16 arrays; the explicit mode= arg is
    # deprecated (removal in Pillow 13)
    Image.fromarray(arr).save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.dtype == np.int32:  # PIL loads 16-bit as I (int32)
        arr = arr.astype(np.uint16)
    return arr
