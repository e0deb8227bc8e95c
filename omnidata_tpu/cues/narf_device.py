"""Device-side NARF border prefix (keypoints3d): the convolution-shaped
stages of the operator — range-image pyramid, PCA surface normals,
4-direction border probability, obstacle/shadow classification,
surface-change score/direction, blur — as one jitted XLA program batched
over a dispatch of views.

Counterpart split of the reference's PCL pipeline (pcl_narf.hpp:205-470 /
native/narf.cpp): stages 1-3 are fixed-radius stencils over the range
image (shift + elementwise math — exactly what the TPU VPU eats), while
stage 4 (per-pixel region growing over the metric support radius) is
data-dependent in frontier size and shape and stays on the host
(native/narf.cpp narf_interest_image_from_maps consumes these maps).
Measured split on the golden hm3d depth (512x512, 1 host core): borders
1020 ms (74%) vs interest 350 ms — this module removes the 74% from the
host's critical path.

Numerics mirror the validated numpy twin (cues/keypoints3d._extract_borders,
native-parity corr >0.8) with two deviations that stay inside that
tolerance: float32 accumulation (no f64 on TPU) and closed-form symmetric
3x3 eigensolvers (Cardano + cross-product eigenvectors) instead of
np.linalg.eigh / power iteration — eigenvector SIGN is arbitrary in all
three implementations and everything downstream is sign-aligned or folded.

Outputs are transfer-quantized: the axon tunnel moves ~14 MB in ~370 ms,
so maps ship as uint16 change (1/65535 steps of a [0,1] score), int8
direction components (~0.5 deg worst-case angle error vs 10 deg histogram
bins), and uint8 shadow flags — 6 B/px instead of 24.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_JUMP_FACTOR = 4.0
_SPACING_FACTOR = 1.5
_MIN_BORDER_PROB = 0.8
_DEG2 = math.radians(2.0)
_OPT_PATCH = 10


def n_levels_for(focal: float, H: int, W: int, max_levels: int = 99) -> int:
    """Pyramid depth for one view — the native loop's exact rule
    (narf.cpp:626-631): add a half level while the CURRENT coarsest is
    >=16 px and its angular resolution is still finer than 4 deg/px."""
    S, ar, h, w = 1, math.atan(1.0 / focal), H, W
    while 0.5 * ar < _DEG2 and w >= 16 and h >= 16 and S < max_levels:
        S += 1
        ar *= 2.0
        h //= 2
        w //= 2
    return S


def max_levels_for(H: int, W: int) -> int:
    """Static upper bound on n_levels_for over all focals (the ar clause
    only shortens): levels until the coarsest drops below 16 px."""
    S, h, w = 1, H, W
    while w >= 16 and h >= 16:
        S += 1
        h //= 2
        w //= 2
    return S


def _shift(a: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """a[..., y+dy, x+dx] with `fill` outside — static-shape pad+slice."""
    H, W = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [
        (max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
    ap = jnp.pad(a, pad, constant_values=fill)
    y0, x0 = max(0, -dy) + dy, max(0, -dx) + dx
    return jax.lax.slice(
        ap,
        [0] * (a.ndim - 2) + [y0, x0],
        list(a.shape[:-2]) + [y0 + H, x0 + W],
    )


def _shift3(v: jax.Array, dy: int, dx: int, fill=0.0) -> jax.Array:
    """Shift a (..., H, W, 3) field."""
    return jnp.stack([_shift(v[..., k], dy, dx, fill) for k in range(3)], -1)


# ---------------------------------------------------------------------------
# closed-form symmetric 3x3 eigensolvers (vectorized; C = [xx,xy,xz,yy,yz,zz])
# ---------------------------------------------------------------------------

def _eigvals3(C):
    """All three eigenvalues, descending (Cardano / trigonometric form)."""
    xx, xy, xz, yy, yz, zz = (C[..., k] for k in range(6))
    q = (xx + yy + zz) / 3.0
    p1 = xy * xy + xz * xz + yz * yz
    p2 = (xx - q) ** 2 + (yy - q) ** 2 + (zz - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    ps = jnp.maximum(p, 1e-20)
    bxx, byy, bzz = (xx - q) / ps, (yy - q) / ps, (zz - q) / ps
    bxy, bxz, byz = xy / ps, xz / ps, yz / ps
    detB = (bxx * (byy * bzz - byz * byz) - bxy * (bxy * bzz - byz * bxz)
            + bxz * (bxy * byz - byy * bxz))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * math.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return e1, e2, e3


def _eigvec3(C, lam):
    """Unit eigenvector of symmetric C for eigenvalue lam: the largest of
    the three row-cross-product candidates of (C - lam*I) (any two
    independent rows span the orthogonal complement of the eigenspace)."""
    xx, xy, xz, yy, yz, zz = (C[..., k] for k in range(6))
    r0 = jnp.stack([xx - lam, xy, xz], -1)
    r1 = jnp.stack([xy, yy - lam, yz], -1)
    r2 = jnp.stack([xz, yz, zz - lam], -1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
                     jnp.where((n02 >= n12)[..., None], c02, c12))
    nb = jnp.sqrt(jnp.maximum(n01, jnp.maximum(n02, n12)))
    # fully degenerate (isotropic) neighborhoods: any direction; pick +x
    fallback = jnp.zeros_like(best).at[..., 0].set(1.0)
    return jnp.where((nb > 1e-18)[..., None],
                     best / jnp.maximum(nb, 1e-18)[..., None], fallback)


# ---------------------------------------------------------------------------
# pyramid
# ---------------------------------------------------------------------------

def _level0(depth, focal, max_range):
    """(K,H,W) metric depth + (K,) focal -> level-0 (pts, rng, valid, ar)."""
    K, H, W = depth.shape
    f = focal[:, None, None]
    cx, cy = W / 2.0, H / 2.0
    valid = (depth > 1e-6) & (depth < max_range)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    px = (xs - cx) / f * depth
    py = (ys - cy) / f * depth
    pts = jnp.stack([px, py, depth], -1)
    pts = jnp.where(valid[..., None], pts, 0.0)
    rng = jnp.where(valid, jnp.sqrt(px * px + py * py + depth * depth), 1e30)
    ar = jnp.arctan(1.0 / focal)  # (K,)
    return pts, rng.astype(jnp.float32), valid, ar


def _half(pts, rng, valid, ar):
    """Min-range 2x2 pooling (PCL getHalfImage; first-min tie like the
    native scan order (0,0),(0,1),(1,0),(1,1))."""
    K, H, W = rng.shape
    H2, W2 = H // 2, W // 2
    r4 = jnp.stack([rng[:, dy: 2 * H2: 2, dx: 2 * W2: 2]
                    for dy in (0, 1) for dx in (0, 1)], 1)  # (K,4,H2,W2)
    p4 = jnp.stack([pts[:, dy: 2 * H2: 2, dx: 2 * W2: 2]
                    for dy in (0, 1) for dx in (0, 1)], 1)
    v4 = jnp.stack([valid[:, dy: 2 * H2: 2, dx: 2 * W2: 2]
                    for dy in (0, 1) for dx in (0, 1)], 1)
    rr = jnp.where(v4, r4, 1e30)
    k = jnp.argmin(rr, axis=1)  # first min on ties, like np/C++
    rng2 = jnp.min(rr, axis=1)
    p2 = jnp.take_along_axis(p4, k[:, None, ..., None], axis=1)[:, 0]
    valid2 = jnp.any(v4, axis=1)
    rng2 = jnp.where(valid2, rng2, 1e30)
    p2 = jnp.where(valid2[..., None], p2, 0.0)
    return p2, rng2, valid2, ar * 2.0


# ---------------------------------------------------------------------------
# border extraction (one level)
# ---------------------------------------------------------------------------

_DIRS = ((-1, 0), (1, 0), (0, -1), (0, 1))  # (dx, dy) — native DX/DY order


def _extract_borders(pts, rng, valid, ar):
    """(change, cdir, shadow) for one pyramid level; ar is (K,)."""
    p, r = pts, rng
    vf = valid.astype(jnp.float32)
    ar3 = ar[:, None, None]

    # --- typical spacing: jump-excluded mean distance to the 8 direct nbrs
    Kb, Hb, Wb = r.shape
    thresh = _JUMP_FACTOR * r * ar3
    sp_pad = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)))
    sv_pad = jnp.pad(vf, ((0, 0), (1, 1), (1, 1)))

    def _spacing_body(i, carry):
        acc, cnt = carry
        dy, dx = i // 3, i % 3
        q = jax.lax.dynamic_slice(sp_pad, (0, dy, dx, 0), (Kb, Hb, Wb, 3))
        vq = jax.lax.dynamic_slice(sv_pad, (0, dy, dx), (Kb, Hb, Wb)) > 0
        d = jnp.sqrt(jnp.sum((q - p) ** 2, -1))
        ok = vq & (d < thresh) & (i != 4)  # skip the center offset
        return acc + jnp.where(ok, d, 0.0), cnt + ok

    acc, cnt = jax.lax.fori_loop(
        0, 9, _spacing_body, (jnp.zeros_like(r), jnp.zeros_like(r)))
    spacing = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), r * ar3)
    max_nb = _SPACING_FACTOR * jnp.maximum(spacing, r * ar3)
    spacing2 = max_nb * max_nb

    # --- PCA normals over the 5x5 window, excluding jumps. The 25-offset
    # window rides a fori_loop with dynamic-slice shifts: unrolled it blows
    # the HLO graph up ~5x and compile time with it (the body is pure
    # (K,H,W) vector work either way).
    K, H, W = r.shape
    p_pad = jnp.pad(p, ((0, 0), (2, 2), (2, 2), (0, 0)))
    v_pad = jnp.pad(vf, ((0, 0), (2, 2), (2, 2)))

    def _pca_body(i, carry):
        n_sum, o_sum, n_cnt = carry
        dy, dx = i // 5, i % 5  # 0..4 into the padded frame
        q = jax.lax.dynamic_slice(p_pad, (0, dy, dx, 0), (K, H, W, 3))
        vq = jax.lax.dynamic_slice(v_pad, (0, dy, dx), (K, H, W)) > 0
        rel = q - p
        ok = vq & valid & (jnp.sum(rel * rel, -1) <= 4.0 * spacing2)
        rel = jnp.where(ok[..., None], rel, 0.0)
        o_sum = o_sum + jnp.stack(
            [rel[..., 0] * rel[..., 0], rel[..., 0] * rel[..., 1],
             rel[..., 0] * rel[..., 2], rel[..., 1] * rel[..., 1],
             rel[..., 1] * rel[..., 2], rel[..., 2] * rel[..., 2]], -1)
        return n_sum + rel, o_sum, n_cnt + ok

    n_sum, o_sum, n_cnt = jax.lax.fori_loop(
        0, 25, _pca_body,
        (jnp.zeros(p.shape, jnp.float32),
         jnp.zeros(p.shape[:-1] + (6,), jnp.float32), jnp.zeros_like(r)))
    inv = 1.0 / jnp.maximum(n_cnt, 1.0)
    mean = n_sum * inv[..., None]
    cov = o_sum * inv[..., None] - jnp.stack(
        [mean[..., 0] * mean[..., 0], mean[..., 0] * mean[..., 1],
         mean[..., 0] * mean[..., 2], mean[..., 1] * mean[..., 1],
         mean[..., 1] * mean[..., 2], mean[..., 2] * mean[..., 2]], -1)
    _, _, emin = _eigvals3(cov)
    normal = _eigvec3(cov, emin)
    flip = jnp.sum(normal * p, -1) > 0
    normal = jnp.where(flip[..., None], -normal, normal)
    has_normal = (n_cnt >= 3) & valid

    # --- 4-direction border probabilities from 1d point averages
    bscores, nbs, nbcnts, fars = [], [], [], []
    for (dx, dy) in _DIRS:
        nb_sum = jnp.zeros(p.shape, jnp.float32)
        nb_cnt = jnp.zeros_like(r)
        alive = jnp.ones_like(valid)
        far = jnp.zeros_like(valid)
        for i in range(1, 4):  # kBorderLookPx
            q = _shift3(p, i * dy, i * dx)
            vq = _shift(vf, i * dy, i * dx, 0.0) > 0
            rq = _shift(r, i * dy, i * dx, 0.0)  # OOB: not far
            far = far | (alive & ~vq & (rq >= 5e29))
            add = alive & vq
            nb_sum += jnp.where(add[..., None], q, 0.0)
            nb_cnt += add
            alive = add
        nb = nb_sum / jnp.maximum(nb_cnt, 1.0)[..., None]
        d2 = jnp.sum((nb - p) ** 2, -1)
        s = jnp.where(d2 > spacing2,
                      1.0 - jnp.sqrt(spacing2 / jnp.maximum(d2, 1e-20)), 0.0)
        s = jnp.where(jnp.sqrt(jnp.sum(nb * nb, -1)) < r, -s, s)
        s = jnp.where(nb_cnt > 0, s, jnp.where(far, 1.0, 0.0))
        bscores.append(jnp.where(valid, s, 0.0))
        nbs.append(nb)
        nbcnts.append(nb_cnt)
        fars.append(far)

    # --- obstacle borders (direction-local maxima above threshold);
    #     background side of each jump becomes a shadow border
    obstacle = jnp.zeros_like(valid)
    shadow = jnp.zeros_like(valid)
    for d, (dx, dy) in enumerate(_DIRS):
        s = bscores[d]
        is_max = jnp.ones_like(valid)
        for k in (1, 2):
            is_max = is_max & (_shift(s, k * dy, k * dx, -1.0) <= s)
        hit = valid & (s >= _MIN_BORDER_PROB) & is_max
        obstacle = obstacle | hit
        moved = _shift(hit.astype(jnp.float32), -dy, -dx, 0.0) > 0
        src_rng = _shift(r, -dy, -dx, 1e30)
        shadow = shadow | (moved & valid & (r > src_rng))

    # --- surface change scores + directions
    usable = (valid & ~shadow & has_normal).astype(jnp.float32)
    shf = shadow.astype(jnp.float32)
    us_pad = jnp.pad(usable, ((0, 0), (2, 2), (2, 2)))
    sh_pad = jnp.pad(shf, ((0, 0), (2, 2), (2, 2)))
    nm_pad = jnp.pad(normal, ((0, 0), (2, 2), (2, 2), (0, 0)))

    def _outer6(n):
        return jnp.stack(
            [n[..., 0] * n[..., 0], n[..., 0] * n[..., 1],
             n[..., 0] * n[..., 2], n[..., 1] * n[..., 1],
             n[..., 1] * n[..., 2], n[..., 2] * n[..., 2]], -1)

    def _beam_body(i, carry):
        nn_sum, no_sum, nn_cnt = carry
        j = i + (i >= 4)  # skip the center of the 3x3 beam grid
        by, bx = j // 3 - 1, j % 3 - 1
        u1 = jax.lax.dynamic_slice(
            us_pad, (0, 2 + by, 2 + bx), (Kb, Hb, Wb)) > 0
        sh1 = jax.lax.dynamic_slice(
            sh_pad, (0, 2 + by, 2 + bx), (Kb, Hb, Wb)) > 0
        n1 = jax.lax.dynamic_slice(
            nm_pad, (0, 2 + by, 2 + bx, 0), (Kb, Hb, Wb, 3))
        nn_sum = nn_sum + jnp.where(u1[..., None], n1, 0.0)
        no_sum = no_sum + jnp.where(u1[..., None], _outer6(n1), 0.0)
        nn_cnt = nn_cnt + u1
        # step 2 only if the step-1 pixel was not a shadow border
        u2 = (jax.lax.dynamic_slice(
            us_pad, (0, 2 + 2 * by, 2 + 2 * bx), (Kb, Hb, Wb)) > 0) & ~sh1
        n2 = jax.lax.dynamic_slice(
            nm_pad, (0, 2 + 2 * by, 2 + 2 * bx, 0), (Kb, Hb, Wb, 3))
        nn_sum = nn_sum + jnp.where(u2[..., None], n2, 0.0)
        no_sum = no_sum + jnp.where(u2[..., None], _outer6(n2), 0.0)
        return nn_sum, no_sum, nn_cnt + u2

    nn_sum, no_sum, nn_cnt = jax.lax.fori_loop(
        0, 8, _beam_body,
        (jnp.zeros(p.shape, jnp.float32),
         jnp.zeros(p.shape[:-1] + (6,), jnp.float32), jnp.zeros_like(r)))
    ninv = 1.0 / jnp.maximum(nn_cnt, 1.0)
    nmean = nn_sum * ninv[..., None]
    ncov = no_sum * ninv[..., None] - jnp.stack(
        [nmean[..., 0] * nmean[..., 0], nmean[..., 0] * nmean[..., 1],
         nmean[..., 0] * nmean[..., 2], nmean[..., 1] * nmean[..., 1],
         nmean[..., 1] * nmean[..., 2], nmean[..., 2] * nmean[..., 2]], -1)
    emax, _, _ = _eigvals3(ncov)
    vmax = _eigvec3(ncov, emax)
    ok = (nn_cnt >= 3) & valid & ~shadow & ~obstacle
    change = jnp.where(ok, jnp.minimum(1.0, jnp.sqrt(jnp.maximum(emax, 0.0))),
                       0.0)
    cdir = jnp.where(ok[..., None], vmax, 0.0)

    # border pixels: score 1, direction across the border projected into the
    # tangent plane
    bacc = jnp.zeros(p.shape, jnp.float32)
    ray = p / jnp.maximum(jnp.sqrt(jnp.sum(p * p, -1, keepdims=True)), 1e-12)
    for d in range(4):
        s = jnp.where(bscores[d] >= _MIN_BORDER_PROB, bscores[d], 0.0)
        nb, nb_cnt, far = nbs[d], nbcnts[d], fars[d]
        v = nb - p
        v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, -1, keepdims=True)), 1e-12)
        v = jnp.where((nb_cnt > 0)[..., None], v,
                      jnp.where(far[..., None], ray, 0.0))
        bacc += s[..., None] * v
    proj = bacc - jnp.sum(bacc * normal, -1, keepdims=True) * normal
    proj = jnp.where(has_normal[..., None], proj, bacc)
    pn = jnp.sqrt(jnp.sum(proj * proj, -1, keepdims=True))
    bdir = jnp.where(pn > 1e-12, proj / jnp.maximum(pn, 1e-12), 0.0)
    change = jnp.where(obstacle, 1.0, change)
    cdir = jnp.where(obstacle[..., None], bdir, cdir)

    # --- blur: 3x3 score mean + radius-2 sign-aligned direction smoothing
    live = valid & ~shadow
    lf = live.astype(jnp.float32)
    ssum = jnp.zeros_like(r)
    scnt = jnp.zeros_like(r)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            lv = _shift(lf, dy, dx, 0.0) > 0
            ssum += jnp.where(lv, _shift(change, dy, dx, 0.0), 0.0)
            scnt += lv
    lf_pad = jnp.pad(lf, ((0, 0), (2, 2), (2, 2)))
    cd_pad = jnp.pad(cdir, ((0, 0), (2, 2), (2, 2), (0, 0)))
    ch_pad = jnp.pad(change, ((0, 0), (2, 2), (2, 2)))

    def _dir_body(i, dsum):
        dy, dx = i // 5, i % 5
        lv = jax.lax.dynamic_slice(lf_pad, (0, dy, dx), (K, H, W)) > 0
        v = jax.lax.dynamic_slice(cd_pad, (0, dy, dx, 0), (K, H, W, 3))
        sgn = jnp.where(jnp.sum(v * cdir, -1) < 0, -1.0, 1.0)
        c = jax.lax.dynamic_slice(ch_pad, (0, dy, dx), (K, H, W))
        return dsum + jnp.where(lv[..., None], (c * sgn)[..., None] * v, 0.0)

    dsum = jax.lax.fori_loop(0, 25, _dir_body,
                             jnp.zeros(p.shape, jnp.float32))
    change_b = jnp.where(live, ssum / jnp.maximum(scnt, 1.0), 0.0)
    dn = jnp.sqrt(jnp.sum(dsum * dsum, -1, keepdims=True))
    cdir_b = jnp.where(dn > 1e-12, dsum / jnp.maximum(dn, 1e-12), 0.0)
    return change_b, cdir_b, shadow


def _quantize(change, cdir, shadow):
    ch = jnp.round(jnp.clip(change, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    cd = jnp.round(jnp.clip(cdir, -1.0, 1.0) * 127.0).astype(jnp.int8)
    return ch, cd, shadow.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("n_levels", "max_range"))
def narf_border_maps(depth_m: jax.Array, focal: jax.Array,
                     n_levels: int, max_range: float = 128.0):
    """(K,H,W) metric depth + (K,) per-view focal -> tuple over pyramid
    levels of quantized (change u16, cdir i8 (...,3), shadow u8) maps.

    One XLA program per (K,H,W,n_levels); all levels computed for every
    view (coarse levels are cheap) — the host driver slices each view's
    own n_levels_for(focal) prefix before handing maps to the native
    interest stage."""
    depth_m = depth_m.astype(jnp.float32)
    focal = focal.astype(jnp.float32)
    pts, rng, valid, ar = _level0(depth_m, focal, max_range)
    out = [_quantize(*_extract_borders(pts, rng, valid, ar))]
    for _ in range(1, n_levels):
        pts, rng, valid, ar = _half(pts, rng, valid, ar)
        out.append(_quantize(*_extract_borders(pts, rng, valid, ar)))
    return tuple(out)


def border_maps_for_views(depth_m, focal, max_range: float = 128.0):
    """Convenience host driver: numpy/device depth (K,H,W) + per-view focal
    array -> per-view lists of numpy map tuples, each sliced to that view's
    native pyramid depth (n_levels_for)."""
    K, H, W = depth_m.shape
    n_levels = max_levels_for(H, W)
    maps = narf_border_maps(jnp.asarray(depth_m), jnp.asarray(focal),
                            n_levels, max_range)
    maps = jax.device_get(maps)
    focal = np.asarray(focal)
    per_view = []
    for k in range(K):
        S = min(n_levels, n_levels_for(float(focal[k]), H, W))
        per_view.append([(lvl[0][k], lvl[1][k], lvl[2][k])
                         for lvl in maps[:S]])
    return per_view
