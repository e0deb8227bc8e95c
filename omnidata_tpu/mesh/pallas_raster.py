"""Pallas TPU rasterization kernel — the hot loop of render_view with
*dynamic* per-tile trip counts.

The XLA path (raster.py) must scan a fixed `cap` of candidate slots per tile;
most tiles have far fewer real candidates (the bench scene averages ~8 of a
1024 cap), so >90% of its intersection work is padding. This kernel reads the
per-tile candidate count from SMEM (scalar prefetch) and runs
ceil(count/chunk) loop iterations — work proportional to the real candidate
load, which XLA's static shapes cannot express.

Two passes per pixel block, both with dynamic trip counts:
1. find the winner: packed order-preserving int32 of t with the cap-slot in
   the low bits, one fused min-reduction per chunk;
2. extract the winner's (t, u, v, face) by a select-and-sum sweep (slot ==
   best_slot picks exactly one lane) — this replaces the XLA tail's per-pixel
   element-gathers (2.4M of them, ~20 ms/view on v5e) with pure VPU work.

Layout (per pallas_guide.md): grid = (tiles,); per-tile VMEM blocks are
*separate* (1,1,cap)/(1,1,P) planes — stacking/transposing small minor dims
costs tens of ms on TPU. Pixels are processed in sub-blocks of PBLK so every
(PBLK, chunk) intermediate fits VMEM.
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
# winner's exact t/u/v are recomputed in the extraction pass)


def _mt_chunk(ox, oy, oz, dx, dy, dz, tri_refs, ci, chunk, count):
    """Möller–Trumbore for one (pblk, chunk) block; returns t,u,v,hit,slot."""
    sl = lambda r: r[0, 0, pl.ds(ci * chunk, chunk)][None, :]
    v0x, v0y, v0z = sl(tri_refs[0]), sl(tri_refs[1]), sl(tri_refs[2])
    e1x, e1y, e1z = sl(tri_refs[3]), sl(tri_refs[4]), sl(tri_refs[5])
    e2x, e2y, e2z = sl(tri_refs[6]), sl(tri_refs[7]), sl(tri_refs[8])

    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    e2q = e2x * qx + e2y * qy + e2z * qz  # (1,chunk)

    px = dy * e2z - dz * e2y  # (pblk, chunk)
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < _EPS, 0.0,
                    1.0 / jnp.where(det == 0.0, 1.0, det))
    u = (tvx * px + tvy * py + tvz * pz) * inv
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = e2q * inv
    slot = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) + ci * chunk
    hit = (
        (jnp.abs(det) >= _EPS)
        & (u >= -_EDGE_EPS)
        & (v >= -_EDGE_EPS)
        & (u + v <= 1.0 + _EDGE_EPS)
        & (t > _EPS)
        & (slot < count)
    )
    return t, u, v, hit, slot


def _raster_tile_kernel(counts_ref, origin_ref, tri_refs, tid_ref, dir_refs,
                        attr_refs, out_refs, *, chunk: int, pblk: int):
    """One tile. tri_refs 9x (1,1,cap) f32, tid_ref (1,1,cap) int32 face ids,
    dir_refs 3x (1,1,P), attr_refs 3*C x (1,1,cap) corner-value planes
    (a0,a1,a2 per channel), out_refs = (packed, t, u, v, face, *C attrs)."""
    t_idx = pl.program_id(0)
    count = counts_ref[t_idx]
    cap = tri_refs[0].shape[2]
    P = dir_refs[0].shape[2]
    n_chunks = jnp.minimum((count + chunk - 1) // chunk, cap // chunk)

    ox = origin_ref[0, 0]
    oy = origin_ref[0, 1]
    oz = origin_ref[0, 2]

    mask_low = jnp.int32((1 << _IDX_BITS) - 1)
    # host-computed constant: scalar tpu.bitcast is not lowerable in-kernel
    big_packed = jnp.int32(
        int(np.float32(_BIG).view(np.int32)) & ~((1 << _IDX_BITS) - 1)
    )

    packed_out, t_out, u_out, v_out, f_out = out_refs[:5]
    attr_outs = out_refs[5:]
    n_attr = len(attr_outs)

    for pb in range(P // pblk):
        pslice = slice(pb * pblk, (pb + 1) * pblk)
        dx = dir_refs[0][0, 0, pslice][:, None]  # (pblk,1)
        dy = dir_refs[1][0, 0, pslice][:, None]
        dz = dir_refs[2][0, 0, pslice][:, None]

        def find_body(ci, best):
            t, u, v, hit, slot = _mt_chunk(ox, oy, oz, dx, dy, dz, tri_refs,
                                           ci, chunk, count)
            tt = jnp.where(hit, t, _BIG)
            ti = jax.lax.bitcast_convert_type(tt, jnp.int32)
            packed = (ti & ~mask_low) | slot
            return jnp.minimum(best, jnp.min(packed, axis=1))

        best = jax.lax.fori_loop(
            0, n_chunks, find_body, jnp.full((pblk,), big_packed, jnp.int32)
        )
        best_slot = (best & mask_low)[:, None]  # (pblk,1)

        def extract_body(ci, acc):
            t_acc, u_acc, v_acc, f_acc, a_accs = acc
            t, u, v, hit, slot = _mt_chunk(ox, oy, oz, dx, dy, dz, tri_refs,
                                           ci, chunk, count)
            win = hit & (slot == best_slot)  # exactly one lane per pixel
            tid = tid_ref[0, 0, pl.ds(ci * chunk, chunk)][None, :]
            t_acc = t_acc + jnp.sum(jnp.where(win, t, 0.0), axis=1)
            u_acc = u_acc + jnp.sum(jnp.where(win, u, 0.0), axis=1)
            v_acc = v_acc + jnp.sum(jnp.where(win, v, 0.0), axis=1)
            f_acc = f_acc + jnp.sum(jnp.where(win, tid, 0), axis=1)
            # barycentric attribute interpolation for the winner lane
            w0 = 1.0 - u - v
            new_a = []
            for c in range(n_attr):
                sl = lambda r: r[0, 0, pl.ds(ci * chunk, chunk)][None, :]
                a0 = sl(attr_refs[3 * c])
                a1 = sl(attr_refs[3 * c + 1])
                a2 = sl(attr_refs[3 * c + 2])
                val = w0 * a0 + u * a1 + v * a2
                new_a.append(a_accs[c] + jnp.sum(jnp.where(win, val, 0.0), axis=1))
            return t_acc, u_acc, v_acc, f_acc, tuple(new_a)

        z1 = jnp.zeros((pblk,), jnp.float32)
        t_b, u_b, v_b, f_b, a_b = jax.lax.fori_loop(
            0, n_chunks, extract_body,
            (z1, z1, z1, jnp.zeros((pblk,), jnp.int32),
             tuple(jnp.zeros((pblk,), jnp.float32) for _ in range(n_attr))),
        )
        valid = best < big_packed
        packed_out[0, 0, pslice] = best
        t_out[0, 0, pslice] = jnp.where(valid, t_b, _BIG)
        u_out[0, 0, pslice] = u_b
        v_out[0, 0, pslice] = v_b
        f_out[0, 0, pslice] = jnp.where(valid, f_b, -1)
        for c in range(n_attr):
            attr_outs[c][0, 0, pslice] = a_b[c]


@partial(jax.jit, static_argnames=("chunk", "pblk", "interpret"))
def raster_tiles_pallas(
    counts: jax.Array,        # (T,) int32
    origin: jax.Array,        # (3,)
    tri_planes: tuple,        # 9x (T, cap) f32 — gathered per-tile SoA planes
    tile_tris: jax.Array,     # (T, cap) int32 — face ids per slot
    dir_planes: tuple,        # 3x (T, P) f32
    attr_planes: tuple = (),  # 3*C x (T, cap) corner-value planes
    chunk: int = 128,
    pblk: int = 512,
    interpret: bool = False,
):
    """-> (valid (T,P) bool, t, u, v (T,P) f32, face (T,P) int32,
    attrs (T,P,C) f32 — barycentric-interpolated winner attributes)."""
    T, cap = tri_planes[0].shape
    P = dir_planes[0].shape[1]
    assert cap <= (1 << _IDX_BITS), cap
    assert len(attr_planes) % 3 == 0
    n_attr = len(attr_planes) // 3
    tri3 = [a.reshape(T, 1, cap) for a in tri_planes]
    tid3 = tile_tris.reshape(T, 1, cap)
    dir3 = [a.reshape(T, 1, P) for a in dir_planes]
    attr3 = [a.reshape(T, 1, cap) for a in attr_planes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda t, c: (0, 0), memory_space=pltpu.SMEM),
            *[pl.BlockSpec((1, 1, cap), lambda t, c: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(9)],
            pl.BlockSpec((1, 1, cap), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
            *[pl.BlockSpec((1, 1, cap), lambda t, c: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(len(attr3))],
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, P), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(5 + n_attr)
        ),
    )

    def kernel(counts_ref, origin_ref, *refs):
        tri_refs = refs[:9]
        tid_ref = refs[9]
        dir_refs = refs[10:13]
        attr_refs = refs[13 : 13 + 3 * n_attr]
        out_refs = refs[13 + 3 * n_attr :]
        _raster_tile_kernel(
            counts_ref, origin_ref, tri_refs, tid_ref, dir_refs, attr_refs,
            out_refs, chunk=chunk, pblk=pblk,
        )

    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),    # packed
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),  # t
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),  # u
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),  # v
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),    # face
            *[jax.ShapeDtypeStruct((T, 1, P), jnp.float32) for _ in range(n_attr)],
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(counts.astype(jnp.int32), origin.reshape(1, 3), *tri3, tid3, *dir3, *attr3)
    packed, t, u, v, f = (o[:, 0, :] for o in outs[:5])
    attrs = (
        jnp.stack([o[:, 0, :] for o in outs[5:]], -1)
        if n_attr
        else jnp.zeros((T, P, 0))
    )
    big_packed = jnp.int32(
        int(np.float32(_BIG).view(np.int32)) & ~((1 << _IDX_BITS) - 1)
    )
    valid = packed < big_packed
    return valid, t, u, v, f, attrs


def corner_planes(mesh_faces: jax.Array, attr: jax.Array, tile_tris: jax.Array):
    """Per-candidate corner-value planes for a per-vertex attribute (V,C):
    3*C planes of shape (T,cap), ordered (a0,a1,a2) per channel."""
    out = []
    for c in range(attr.shape[1]):
        col = attr[:, c]
        for k in range(3):
            per_face = col[mesh_faces[:, k]]  # (F,)
            out.append(per_face[tile_tris])  # (T,cap)
    # reorder to (a0,a1,a2) per channel: currently already per channel triples
    return tuple(out)
