"""Pallas TPU rasterization kernel — the hot loop of render_view with
*dynamic* per-tile trip counts.

The XLA path (raster.py) must scan a fixed `cap` of candidate slots per tile;
most tiles have far fewer real candidates (the bench scene averages ~8 of a
1024 cap), so >90% of its intersection work is padding. This kernel reads the
per-tile candidate count from SMEM (scalar prefetch) and runs
ceil(count/chunk) loop iterations — work proportional to the real candidate
load, which XLA's static shapes cannot express.

Single fused sweep per pixel block:
1. Möller–Trumbore in the factored form det = −D·n, u·det = D·r,
   v·det = D·q, t·det = e2·q, where n = e1×e2, q = tvec×e1, r = e2×tvec are
   *per-candidate* cross products computed once per chunk on (1, chunk)
   lanes — the per-pixel work drops to 9 fused multiply-adds plus the
   reciprocal for the depth key.
2. Winner tracking: packed order-preserving int32 of t with the cap-slot in
   the low mantissa bits, one fused min-reduction per chunk.
3. Winner extraction *in the same sweep*: a one-hot (packed == chunk-min)
   pixel×candidate mask matmuls against the packed per-candidate column
   matrix [v0|e1|e2|face_id|attr corners] on the MXU — one (pblk, chunk) @
   (chunk, COLS) dot per chunk replaces per-channel masked lane reductions.

The kernel emits the winner's *raw columns* (P, COLS) per tile; the exact
t/u/v recompute, face-id decode and barycentric attribute interpolation
happen in XLA afterwards, where they are full-width fused elementwise work.
(Doing them in-kernel on (pblk, 1) column slices ran at 1/128th lane
efficiency and dominated the kernel: 11 ms/view vs 1.5 ms/view for the
sweep itself.)

Layout (per pallas_guide.md): grid = (tiles,); per-tile VMEM blocks are
*separate* (1,1,cap)/(1,1,P) planes for the intersection math (lanes = cap)
plus one (1, cap, COLS) pack block for the extraction matmul. Pixels are
processed in sub-blocks of PBLK so every (PBLK, chunk) intermediate fits
VMEM. The grid may concatenate K views along the tile axis (cross-view
batching); each view's ray origin is prefetched from a (K, 3) SMEM table.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_EPS = 1e-7
_EDGE_EPS = 1e-5
_IDX_BITS = 12  # cap <= 4096 slots packed in the mantissa low bits
# (in-loop t ordering tolerates the 2^-11 relative mantissa corruption: the
# winner's exact t/u/v are recomputed from the extracted geometry columns)


def _big_packed() -> jnp.int32:
    # host-computed constant: scalar tpu.bitcast is not lowerable in-kernel
    return jnp.int32(
        int(np.float32(_BIG).view(np.int32)) & ~((1 << _IDX_BITS) - 1)
    )


def _raster_tile_kernel(counts_ref, origins_ref, tri_refs, pack_ref, dir_refs,
                        packed_out, acc_out, *, chunk: int, pblk: int,
                        tiles_per_view: int):
    """One tile. tri_refs 9x (1,1,cap) f32 SoA planes (v0/e1/e2 xyz),
    pack_ref (1, COLS, cap) f32 with COLS = 9 geometry + 1 face id + 3*C
    attribute corner columns (transposed so the long `cap` axis rides the
    128-lane dimension — a (cap, COLS) layout lane-pads COLS to 128, a 3.5x
    HBM blowup), dir_refs 3x (1,1,P) ray directions."""
    t_idx = pl.program_id(0)
    count = counts_ref[t_idx]
    cap = tri_refs[0].shape[2]
    COLS = pack_ref.shape[1]
    P = dir_refs[0].shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, cap // chunk)

    view = t_idx // tiles_per_view
    ox = origins_ref[view, 0]
    oy = origins_ref[view, 1]
    oz = origins_ref[view, 2]

    mask_low = jnp.int32((1 << _IDX_BITS) - 1)
    big_packed = _big_packed()

    for pb in range(P // pblk):
        pslice = slice(pb * pblk, (pb + 1) * pblk)
        dx = dir_refs[0][0, 0, pslice][:, None]  # (pblk,1)
        dy = dir_refs[1][0, 0, pslice][:, None]
        dz = dir_refs[2][0, 0, pslice][:, None]

        def body(ci, carry):
            best, acc = carry  # (pblk,) int32 · (pblk, COLS) f32
            sl = lambda r: r[0, 0, pl.ds(ci * chunk, chunk)][None, :]
            v0x, v0y, v0z = sl(tri_refs[0]), sl(tri_refs[1]), sl(tri_refs[2])
            e1x, e1y, e1z = sl(tri_refs[3]), sl(tri_refs[4]), sl(tri_refs[5])
            e2x, e2y, e2z = sl(tri_refs[6]), sl(tri_refs[7]), sl(tri_refs[8])

            # per-candidate (1, chunk) precompute: tvec, n, q, r, e2·q
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            nx = e1y * e2z - e1z * e2y
            ny = e1z * e2x - e1x * e2z
            nz = e1x * e2y - e1y * e2x
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            rx = e2y * tvz - e2z * tvy
            ry = e2z * tvx - e2x * tvz
            rz = e2x * tvy - e2y * tvx
            e2q = e2x * qx + e2y * qy + e2z * qz

            # per-pixel: 9 fmas (det = e1·(D×e2) = −D·n, u·det = tvec·(D×e2)
            # = D·r, v·det = D·q) — the cross products above are hoisted off
            # the pixel axis entirely.
            det = -(dx * nx + dy * ny + dz * nz)  # (pblk, chunk)
            udet = dx * rx + dy * ry + dz * rz
            vdet = dx * qx + dy * qy + dz * qz

            adet = jnp.abs(det)
            sgn = jnp.where(det >= 0.0, 1.0, -1.0)
            us = udet * sgn  # = u·|det|
            vs = vdet * sgn
            ts = e2q * sgn   # = t·|det|
            hit = (
                (adet >= _EPS)
                & (us >= -_EDGE_EPS * adet)
                & (vs >= -_EDGE_EPS * adet)
                & (us + vs <= (1.0 + _EDGE_EPS) * adet)
                & (ts > _EPS * adet)
            )
            t = jnp.where(hit, ts / jnp.maximum(adet, _EPS * _EPS), _BIG)

            slot = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) + ci * chunk
            ti = jax.lax.bitcast_convert_type(t, jnp.int32)
            packed = (ti & ~mask_low) | slot
            pj = jnp.min(packed, axis=1)  # (pblk,)
            improved = pj < best

            # one-hot winner extraction on the MXU: exactly one lane matches
            # the chunk minimum (slots are unique), so win @ pack pulls the
            # winner's geometry/face/attr columns in a single dot.
            # precision=HIGHEST is REQUIRED: the default f32 matmul truncates
            # operands to bf16 on v5e (silently corrupting face ids and
            # geometry); the bf16x3 passes of HIGHEST recover the one-hot
            # selection exactly (disjoint-bit-range parts sum losslessly).
            win = (packed == pj[:, None]).astype(jnp.float32)
            a_slice = pack_ref[0, :, pl.ds(ci * chunk, chunk)]  # (COLS, chunk)
            contrib = jax.lax.dot_general(
                win, a_slice, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            acc = jnp.where(improved[:, None], contrib, acc)
            best = jnp.minimum(best, pj)
            return best, acc

        best, acc = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.full((pblk,), big_packed, jnp.int32),
             jnp.zeros((pblk, COLS), jnp.float32)),
        )
        packed_out[0, 0, pslice] = best
        acc_out[0, :, pslice] = acc.T  # (COLS, pblk); P rides the lane dim


@partial(jax.jit, static_argnames=("chunk", "pblk", "interpret", "tiles_per_view"))
def raster_tiles_pallas(
    counts: jax.Array,        # (T,) int32
    origin: jax.Array,        # (3,) or (K,3) per-view ray origins
    tri_planes: tuple,        # 9x (T, cap) f32 — gathered per-tile SoA planes
    pack: jax.Array,          # (T, COLS, cap) f32 — [v0|e1|e2|face_id|attrs]
    dir_planes: tuple,        # 3x (T, P) f32
    chunk: int = 128,
    pblk: int = 512,
    interpret: bool = False,
    tiles_per_view: int | None = None,  # default: all tiles share origin[0]
):
    """-> (valid (T,P) bool, t, u, v (T,P) f32, face (T,P) int32,
    attrs (T,P,C) f32 — barycentric-interpolated winner attributes,
    C = (COLS - 10) // 3)."""
    T, cap = tri_planes[0].shape
    P = dir_planes[0].shape[1]
    COLS = pack.shape[1]
    assert cap <= (1 << _IDX_BITS), cap
    assert (COLS - 10) % 3 == 0
    n_attr = (COLS - 10) // 3
    origins = origin.reshape(-1, 3)
    if tiles_per_view is None:
        tiles_per_view = T
    assert T % tiles_per_view == 0
    tri3 = [a.reshape(T, 1, cap) for a in tri_planes]
    dir3 = [a.reshape(T, 1, P) for a in dir_planes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            *[pl.BlockSpec((1, 1, cap), lambda t, c, o: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(9)],
            pl.BlockSpec((1, COLS, cap), lambda t, c, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, 1, P), lambda t, c, o: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P), lambda t, c, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COLS, P), lambda t, c, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )

    def kernel(counts_ref, origins_ref, *refs):
        _raster_tile_kernel(
            counts_ref, origins_ref, refs[:9], refs[9], refs[10:13],
            refs[13], refs[14], chunk=chunk, pblk=pblk,
            tiles_per_view=tiles_per_view,
        )

    packed, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),       # packed key
            jax.ShapeDtypeStruct((T, COLS, P), jnp.float32),  # winner columns
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts.astype(jnp.int32), origins, *tri3, pack, *dir3)

    packed = packed[:, 0, :]
    valid = packed < _big_packed()

    # exact one-shot winner recompute — full-width fused elementwise XLA
    dx, dy, dz = dir_planes
    v0x, v0y, v0z = acc[:, 0], acc[:, 1], acc[:, 2]
    e1x, e1y, e1z = acc[:, 3], acc[:, 4], acc[:, 5]
    e2x, e2y, e2z = acc[:, 6], acc[:, 7], acc[:, 8]
    o = origins.reshape(T // tiles_per_view, 1, 1, 3)
    o = jnp.broadcast_to(o, (T // tiles_per_view, tiles_per_view, 1, 3)).reshape(T, 1, 3)
    tvx, tvy, tvz = o[..., 0] - v0x, o[..., 1] - v0y, o[..., 2] - v0z
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < _EPS, 0.0,
                    1.0 / jnp.where(det == 0.0, 1.0, det))
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    u = (tvx * px + tvy * py + tvz * pz) * inv
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    t = jnp.where(valid, t, _BIG)
    f = jnp.where(valid, acc[:, 9].astype(jnp.int32), -1)  # exact < 2^24

    if n_attr:
        corners = acc[:, 10:].reshape(T, n_attr, 3, P)
        w0 = (1.0 - u - v)[:, None]
        attrs = (corners[:, :, 0] * w0 + corners[:, :, 1] * u[:, None]
                 + corners[:, :, 2] * v[:, None])  # (T, C, P)
        attrs = jnp.moveaxis(attrs, 1, 2)  # (T, P, C)
    else:
        attrs = jnp.zeros((T, P, 0))
    return valid, t, u, v, f, attrs
