"""3D keypoints: NARF-style interest image from a depth map.

Counterpart of the reference's native keypoints3d path
(create_keypoints_3d_images.py:53-113 shelling out to the PCL NARF binary;
scripts/narf_interest_image.cpp). Here the native component is
omnidata_tpu/native/narf.cpp (self-contained C++, built on first use with
g++ -O3 -shared), driven through ctypes — plus a numpy reference
implementation of the same operator used as a fallback and for
cross-validation in tests.

Contract matches the reference driver: depth in meters (16-bit code *
sensitivity), focal from FOV, support size in meters (settings.py:115),
output interest in [0,1], scaled by 2^16 into a 16-bit PNG.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _build_and_load():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(_NATIVE_DIR, "narf.cpp")
    so = os.path.join(_NATIVE_DIR, "libnarf.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", so, src], check=True
        )
    lib = ctypes.CDLL(so)
    lib.narf_interest_image.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.narf_interest_image.restype = None
    _LIB = lib
    return lib


def narf_interest_image(
    depth_m: np.ndarray,
    focal_px: float,
    support_size: float = 0.3,
    max_range: float = 128.0,
    backend: str = "native",
) -> np.ndarray:
    """Dense NARF-style interest image in [0,1] from metric depth (H,W)."""
    depth_m = np.ascontiguousarray(depth_m, np.float32)
    H, W = depth_m.shape
    if backend == "native":
        try:
            lib = _build_and_load()
        except Exception:
            backend = "numpy"
        else:
            out = np.empty((H, W), np.float32)
            lib.narf_interest_image(
                depth_m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                H, W, float(focal_px), float(focal_px),
                W / 2.0, H / 2.0, float(support_size), float(max_range),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            return out
    return _narf_numpy(depth_m, focal_px, support_size, max_range)


def _narf_numpy(depth: np.ndarray, f: float, support_size: float,
                max_range: float) -> np.ndarray:
    """Vectorized numpy version of native/narf.cpp (same operator)."""
    H, W = depth.shape
    valid = (depth > 1e-6) & (depth < max_range)
    d = np.where(valid, depth, max_range)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    px = (xs + 0.5 - W / 2.0) / f
    py = (ys + 0.5 - H / 2.0) / f
    pts = np.stack([px * d, py * d, d], -1)
    rng = np.linalg.norm(pts, axis=-1)

    # borders
    pad = lambda a, dy, dx: a[
        np.clip(ys.astype(int) + dy, 0, H - 1), np.clip(xs.astype(int) + dx, 0, W - 1)
    ]
    jump = np.zeros((H, W), np.float32)
    for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
        jump = np.maximum(jump, (pad(rng, dy, dx) - rng) / np.maximum(rng, 1e-6))
    border = np.clip(jump * 5.0 - 0.1, 0.0, 1.0) * valid

    # surface change
    def nrm(a):
        n = np.linalg.norm(a, axis=-1, keepdims=True)
        return a / np.maximum(n, 1e-12)

    sh = lambda a, dy, dx: np.stack(
        [pad(a[..., k], dy, dx) for k in range(3)], -1
    )
    c = pts
    l, r = sh(pts, 0, -1), sh(pts, 0, 1)
    u, dn = sh(pts, -1, 0), sh(pts, 1, 0)
    n_left = nrm(np.cross(l - c, dn - c))
    n_right = nrm(np.cross(r - c, u - c))
    n_up = nrm(np.cross(u - c, l - c))
    n_down = nrm(np.cross(dn - c, r - c))
    ch_h = 1.0 - np.abs(np.sum(n_left * n_right, -1))
    ch_v = 1.0 - np.abs(np.sum(n_up * n_down, -1))
    on_border = border > 0.5
    ch_h = np.where(on_border, 0.0, ch_h)
    ch_v = np.where(on_border, 0.0, ch_v)
    change = np.minimum(np.sqrt(0.5 * (ch_h**2 + ch_v**2)), 1.0) * valid
    change[0, :] = change[-1, :] = 0.0
    change[:, 0] = change[:, -1] = 0.0
    direction = 0.5 * np.arctan2(ch_v - ch_h, 2.0 * np.sqrt(ch_h * ch_v) + 1e-12) + np.pi / 4
    direction = np.where(direction < 0, direction + np.pi, direction)

    NB = 8
    bins = (direction / np.pi * NB).astype(int) % NB
    support_radius = 0.5 * support_size
    Rpx = np.clip(np.ceil(support_radius * f / np.maximum(pts[..., 2], 1e-3)), 2, 40).astype(int)

    interest = np.zeros((H, W), np.float32)
    # per-pixel loop (reference quality over speed for the fallback)
    strong = change >= 0.05
    for y in range(H):
        for x in range(W):
            if not valid[y, x]:
                continue
            R = Rpx[y, x]
            y0, y1 = max(0, y - R), min(H, y + R + 1)
            x0, x1 = max(0, x - R), min(W, x + R + 1)
            sm = strong[y0:y1, x0:x1] & valid[y0:y1, x0:x1]
            if not sm.any():
                continue
            yy, xx = np.nonzero(sm)
            dist = np.sqrt((yy + y0 - y) ** 2 + (xx + x0 - x) ** 2) / R
            w = 1.0 - np.abs(dist - 0.25) / 0.75
            ok = (dist <= 1.0) & (w > 0)
            if not ok.any():
                continue
            s = change[y0:y1, x0:x1][yy, xx][ok] * w[ok]
            b = bins[y0:y1, x0:x1][yy, xx][ok]
            hist = np.zeros(NB)
            np.maximum.at(hist, b, s)
            hmax = hist.max()
            diversity = hist.sum() / (hmax * NB) if hmax > 0 else 0.0
            interest[y, x] = min(1.0, hmax * (0.5 + 0.5 * diversity))

    # 3x3 box smooth
    out = np.zeros_like(interest)
    cnt = np.zeros_like(interest)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys0, ys1 = max(0, dy), H + min(0, dy)
            xs0, xs1 = max(0, dx), W + min(0, dx)
            out[ys0:ys1, xs0:xs1] += interest[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx]
            cnt[ys0:ys1, xs0:xs1] += 1
    return out / cnt


def keypoints3d_from_depth_code(
    depth_code_u16: np.ndarray,
    fov_rads: float,
    resolution: int,
    support_size: float = 0.3,
    max_meters: float = 128.0,
    backend: str = "native",
) -> np.ndarray:
    """The reference driver's contract (create_keypoints_3d_images.py:53-113):
    16-bit depth codes -> interest -> uint16 (x 2^16, clipped)."""
    depth_m = depth_code_u16.astype(np.float32) * (max_meters / 65535.0)
    import math

    focal = resolution / (2.0 * math.tan(fov_rads / 2.0))
    interest = narf_interest_image(depth_m, focal, support_size, max_meters, backend)
    return np.clip(interest * 65536.0, 0, 65535).astype(np.uint16)
