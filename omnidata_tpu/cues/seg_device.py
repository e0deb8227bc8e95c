"""Device-side input maps for the segmentation host cues.

The unsupervised segmentation cues (reference:
create_segmentation_2d_images.py:41-85, create_segmentation_25d_images.py:
47-120) are host-sequential at their core (Kruskal union-find + recursive
normalized cuts), but their INPUT construction is convolution-shaped:

- segment_unsup2d blurs the rgb with a sigma~3 gaussian before
  felzenszwalb (the reference passes `sigma` straight into skimage's
  felzenszwalb, which gaussian-filters internally);
- segment_unsup25d builds a 5-channel image [w_d*log(depth)/16,
  w_n*masked-smoothed normals (sigma=2), w_e*edge] where the masked
  smoothing is two gaussian fields per sigma (x*mask and mask).

Both ride the same device dispatch as the render (the pattern
cues/narf_device.py established for the NARF border prefix), removing
~0.35 s/view of scipy.ndimage from the host cue budget — the full13
pipeline's throughput bound (BASELINE.md "full13 scaling model").

Numerics: float32 separable convolutions with scipy's exact kernel
(truncate=4.0, mode='constant'); the host path computes the same maps in
float64. The downstream consumers are threshold/ordering algorithms
(felzenszwalb edge costs, RAG similarity), so the f32-vs-f64 difference
can flip ties; tests/test_cues.py pins device-vs-host label agreement by
ARI instead of bit equality (the golden-label contract is itself
tolerance-based).

Transfers are quantized to uint16 (the axon tunnel moves ~14 MB in
~370 ms): channels ship UNWEIGHTED with static per-channel scales, and the
host applies the settings' weights after dequantization — so one device
program serves any SEGMENTATION_25D_*_WEIGHT configuration.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# static u16 quantization scales (value = code/65535 * scale)
# ch0: log(max(code,1))/16 <= log(65535)/16 ~ 0.6931 (masked mean keeps it)
# ch1-3: normals in [0,1]; ch4: edge u16/255/255 <= 1.0081
SEG25D_QSCALES = (0.75, 1.0, 1.0, 1.0, 1.01)
SEG2D_QSCALE = 255.0


def _gauss_kernel(sigma: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter's order-0 kernel (truncate=4.0)."""
    r = int(4.0 * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * x * x / (sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _blur_hw(x: jax.Array, sigma: float, mode: str = "constant") -> jax.Array:
    """Separable gaussian over the trailing (H, W) dims of (..., H, W).

    mode: scipy.ndimage boundary semantics — 'constant' (zero pad; what the
    masked smoothing uses) or 'reflect' (scipy's edge-duplicating reflect =
    numpy pad 'symmetric'; scipy's DEFAULT, used by felzenszwalb's internal
    blur)."""
    k = jnp.asarray(_gauss_kernel(sigma))
    r = (k.shape[0] - 1) // 2
    lead = x.shape[:-2]
    H, W = x.shape[-2:]
    xr = x.reshape((-1, 1, H, W))
    if mode == "reflect":
        xr = jnp.pad(xr, ((0, 0), (0, 0), (r, r), (r, r)), mode="symmetric")
        pad_v = pad_h = [(0, 0), (0, 0)]
    else:
        assert mode == "constant", mode
        pad_v = [(r, r), (0, 0)]
        pad_h = [(0, 0), (r, r)]
    dn = jax.lax.conv_dimension_numbers(xr.shape, (1, 1, 1, k.shape[0]),
                                        ("NCHW", "OIHW", "NCHW"))
    kv = k.reshape(1, 1, -1, 1)
    kh = k.reshape(1, 1, 1, -1)
    y = jax.lax.conv_general_dilated(xr, kv, (1, 1), pad_v,
                                     dimension_numbers=dn)
    y = jax.lax.conv_general_dilated(y, kh, (1, 1), pad_h,
                                     dimension_numbers=dn)
    return y.reshape(lead + (H, W))


@partial(jax.jit, static_argnames=("sigma",))
def seg2d_blur_maps(rgb_u8: jax.Array, sigma: float = 3.0) -> jax.Array:
    """(K, H, W, 3) uint8 rgb -> blurred image at felzenszwalb's internal
    0-255 scale (img_as_float * 255 then gaussian), quantized uint16."""
    x = rgb_u8.astype(jnp.float32)  # u8/255*255 == the raw byte values
    x = _blur_hw(jnp.moveaxis(x, -1, 1), sigma, mode="reflect")  # (K,3,H,W)
    q = jnp.round(jnp.clip(x / SEG2D_QSCALE, 0.0, 1.0) * 65535.0)
    return jnp.moveaxis(q.astype(jnp.uint16), 1, -1)


@jax.jit
def seg25d_channel_maps(depth_u16: jax.Array, normal_u8: jax.Array,
                        edge_u16: jax.Array) -> jax.Array:
    """(K, H, W[, 3]) encoded outputs -> the 5 UNWEIGHTED segment_unsup25d
    channels (masked-smoothed log-depth sigma=1, masked-smoothed normals
    sigma=2, edge), quantized uint16 with SEG25D_QSCALES."""
    depth = depth_u16.astype(jnp.float32)
    mask = (depth < 2.0**16 - 2.0).astype(jnp.float32)
    eps = jnp.float32(np.finfo(np.float32).eps)

    def sm(x, sigma):
        m = mask if x.ndim == mask.ndim else mask[:, None]
        return _blur_hw(x * m, sigma) / (_blur_hw(m, sigma) + eps)

    ch0 = sm(jnp.log(jnp.maximum(depth, 1.0)) / 16.0, 1.0)
    nrm = normal_u8.astype(jnp.float32) / 255.0
    chn = sm(jnp.moveaxis(nrm, -1, 1), 2.0)  # (K, 3, H, W)
    ch4 = edge_u16.astype(jnp.float32) / 255.0 / 255.0
    chans = jnp.concatenate([ch0[:, None], chn, ch4[:, None]], axis=1)
    scales = jnp.asarray(SEG25D_QSCALES, jnp.float32)[None, :, None, None]
    q = jnp.round(jnp.clip(chans / scales, 0.0, 1.0) * 65535.0)
    return jnp.moveaxis(q.astype(jnp.uint16), 1, -1)  # (K, H, W, 5)


def seg2d_blurred_from_maps(q_u16: np.ndarray) -> np.ndarray:
    """Host dequant: (H, W, 3) uint16 -> float64 blurred image at the
    0-255 felzenszwalb scale (feed segment_2d(blurred255=...))."""
    return np.asarray(q_u16, np.float64) * (SEG2D_QSCALE / 65535.0)


def seg25d_input_from_maps(q_u16: np.ndarray, depth_weight: float,
                           normal_weight: float,
                           edge_weight: float) -> np.ndarray:
    """Host dequant + weighting: (H, W, 5) uint16 -> the float64 5-channel
    image segment_25d feeds felzenszwalb (feed segment_25d(input_img=...))."""
    v = np.asarray(q_u16, np.float64) * (np.asarray(SEG25D_QSCALES) / 65535.0)
    w = np.asarray([depth_weight] + [normal_weight] * 3 + [edge_weight])
    return v * w
