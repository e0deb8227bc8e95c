"""Pallas TPU rasterization kernel — per-tile chunk lists over a
VMEM-resident scene.

Per tile, the XLA side supplies the ids of the (Morton-coherent) 128-face
CHUNKS whose screen bboxes overlap the tile; the kernel loops over exactly
those chunks (dynamic trip count from SMEM scalar prefetch), slicing the
GLOBAL SoA planes and scene pack at chunk_id*chunk. No per-tile gathers, no
face-level sorts, no face caps — candidate admission is chunk-granular
(CHUNK_LIST_CAP chunks/tile).

Single fused sweep per pixel block:
1. Möller–Trumbore in the factored form det = −D·n, u·det = D·r,
   v·det = D·q, t·det = e2·q, where n = e1×e2, q = tvec×e1, r = e2×tvec are
   *per-candidate* cross products computed once per chunk on (1, chunk)
   lanes — the per-pixel work drops to 9 fused multiply-adds plus the
   reciprocal for the depth key.
2. Winner tracking: packed order-preserving int32 of t with the list slot in
   the low mantissa bits (ascending face ids, so mantissa-masked depth ties
   resolve identically to the XLA reference), one fused min-reduction per
   chunk.
3. Winner extraction *in the same sweep*: a one-hot (packed == chunk-min)
   pixel×candidate mask matmuls against the packed per-candidate column
   matrix [v0|e1|e2|face_id|attr corners] on the MXU.

The kernel emits the winner's *raw columns* (P, COLS) per tile; the exact
t/u/v recompute, face-id decode and barycentric attribute interpolation
happen in XLA afterwards, where they are full-width fused elementwise work.

Layout (per pallas_guide.md): the scene planes/pack are SHARED blocks
(index_map -> 0) so Mosaic keeps them VMEM-resident across grid steps; the
grid concatenates K views along the tile axis (cross-view batching) with
per-view ray origins prefetched from a (K, 3) SMEM table.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_EPS = 1e-7
_EDGE_EPS = 1e-5
_IDX_BITS = 13  # t ordering granularity: low 13 mantissa bits are tie bits
_LANE_BITS = 7  # in-chunk lane id lives in the low bits (chunk <= 128)
# (in-loop t ordering tolerates the 2^-11 relative mantissa corruption: the
# winner's exact t/u/v are recomputed from the extracted geometry columns)


def _mt_precompute(rows, ox, oy, oz):
    """Per-chunk Möller-Trumbore invariants from 9 (1, chunk) SoA rows
    (v0/e1/e2 xyz) and the (scalar) ray origin — shared by every kernel so
    the epsilon/tie semantics can never drift between them."""
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = rows
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
    return nx, ny, nz, qx, qy, qz, rx, ry, rz, e2q


def _mt_packed_block(pre, dx, dy, dz, tie_mask):
    """(pblk, chunk) packed candidate keys (t float bits | lane id) for one
    pixel block against one precomputed chunk; misses carry _BIG."""
    nx, ny, nz, qx, qy, qz, rx, ry, rz, e2q = pre
    det = -(dx * nx + dy * ny + dz * nz)
    udet = dx * rx + dy * ry + dz * rz
    vdet = dx * qx + dy * qy + dz * qz

    adet = jnp.abs(det)
    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
    us = udet * sgn
    vs = vdet * sgn
    ts = e2q * sgn
    hit = (
        (adet >= _EPS)
        & (us >= -_EDGE_EPS * adet)
        & (vs >= -_EDGE_EPS * adet)
        & (us + vs <= (1.0 + _EDGE_EPS) * adet)
        & (ts > _EPS * adet)
    )
    t = jnp.where(hit, ts / jnp.maximum(adet, _EPS * _EPS), _BIG)
    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    ti = jax.lax.bitcast_convert_type(t, jnp.int32)
    return (ti & tie_mask) | lane


def _mt_sweep_carry(trip, get_chunk, origin, dir_refs, pblk, packed_out,
                    acc_out, tie_mask, block_start=None, get_flag=None,
                    row: int = 0):
    """Pixel-block-OUTER / chunk-INNER sweep with fori-carried (best, acc),
    writing the grid-mapped output refs exactly ONCE per block.

    Why carry instead of per-chunk ref read-modify-write (the r1-r3
    pattern): Mosaic cannot keep a pipelined out block live across a
    dynamic-trip loop, so every per-chunk fold through the refs paid a full
    block flush/reload — measured 63.5 us per chunk-iteration on v5e where
    the candidate math itself is ~6 us (tested component-by-component with
    synthetic trip counts; see COMPONENTS.md 'Streamed-kernel stage
    profile'). The loop-carried form is the chunklist kernel's pattern and
    removes ~90% of the streamed sweep cost. Per-chunk Möller-Trumbore
    precompute moves inside the block loop (it is (1, chunk)-shaped —
    negligible against the (pblk, chunk) candidate math).

    get_chunk(i) -> (COLS, chunk) pack slice (possibly with extra trailing
    rows — only the first 9 geometry rows and the first COLS rows are
    used); called once per swept (block, chunk) in ascending i order, so it
    may drive a double-buffered DMA pipeline. block_start() runs before
    each block's loop (DMA prologue). get_flag(i, pb) -> (chunk,) row of
    0/1 y-occupancy flags: when given, a chunk whose flag row is all-zero
    for pixel block pb is SKIPPED via lax.cond — winner-exact, because the
    flags are staged from the same conservative bboxes (a face hitting a
    pixel in block pb has a y-range overlapping pb's rows, so its chunk's
    flag is set). Results are bit-identical to the old pattern: same fold
    order, same masked-improvement tie semantics."""
    ox, oy, oz = origin
    P = dir_refs[0].shape[2]
    COLS = acc_out.shape[1]
    big_packed = _big_packed()
    for pb in range(P // pblk):
        ps = slice(pb * pblk, (pb + 1) * pblk)
        dx = dir_refs[0][row, 0, ps][:, None]
        dy = dir_refs[1][row, 0, ps][:, None]
        dz = dir_refs[2][row, 0, ps][:, None]
        if block_start is not None:
            block_start()

        def compute(i, carry):
            best, acc = carry
            a = get_chunk(i)
            rows = tuple(a[j][None, :] for j in range(9))
            pre = _mt_precompute(rows, ox, oy, oz)
            packed = _mt_packed_block(pre, dx, dy, dz, tie_mask)
            pj = jnp.min(packed, axis=1)
            improved = (pj & tie_mask) < (best & tie_mask)
            win = (packed == pj[:, None]).astype(jnp.float32)
            contrib = jax.lax.dot_general(
                win, a[:COLS], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (pblk, COLS)
            return (jnp.where(improved, pj, best),
                    jnp.where(improved[:, None], contrib, acc))

        if get_flag is None:
            body = compute
        else:
            def body(i, carry, _pb=pb):
                occupied = jnp.max(get_flag(i, _pb)) > 0.5
                return jax.lax.cond(
                    occupied, lambda c: compute(i, c), lambda c: c, carry)

        best, acc = jax.lax.fori_loop(
            0, trip, body,
            (jnp.full((pblk,), big_packed, jnp.int32),
             jnp.zeros((pblk, COLS), jnp.float32)),
        )
        packed_out[row, 0, ps] = best
        acc_out[row, :, ps] = acc.T


def _big_packed() -> jnp.int32:
    # host-computed constant: scalar tpu.bitcast is not lowerable in-kernel
    return jnp.int32(
        int(np.float32(_BIG).view(np.int32)) & ~((1 << _IDX_BITS) - 1)
    )


def _chunk_selector(clist_ref, t_idx, count, ccap: int, n_chunks_total: int):
    """Shared per-tile candidate-list decode -> (trip, chunk_of).

    counts encoding (produced by raster.admission_lists):
      count >= 0   exact chunk list: loop `count` listed chunks.
      count == -1  full scan: loop ALL n_chunks_total chunks.
      count <= -2  BLOCK mode: the tile's chunk list overflowed ccap but its
                   8-chunk Morton-block list fits — the same packed 16-bit
                   slots hold bcount = -count-2 ascending BLOCK ids and the
                   kernel expands each to 8 consecutive chunk ids
                   (trip = bcount*8, still ascending). Non-admitted chunks
                   riding along in an admitted block contribute nothing: a
                   face that hits a tile pixel has a screen bbox overlapping
                   the tile, so its chunk is admitted — extra chunks can only
                   add misses (and stage zero faces in the compacting
                   kernels). 12-24x less work than the old scan-all cliff on
                   584k-face scans (~190 blocks vs 4570 chunks).
    The final id is clamped to the last chunk (the tail block may extend
    past n_chunks_total; a re-swept duplicate chunk cannot improve the
    strict masked-min fold, so winners are unchanged). `fresh_of(i)` is
    False exactly for those clamped tail duplicates — the compacting
    kernels use it to avoid re-STAGING the last chunk's faces up to 7
    extra times (which inflates `staged` and could push a tile near the
    cap into the slower raw-list fallback); the plain sweeps ignore it."""
    full = count == -1
    block_mode = count < -1
    trip = jnp.where(
        full, n_chunks_total,
        jnp.where(block_mode, (-count - 2) * 8, count))

    def raw_ci(i):
        jl = jnp.where(block_mode, i // 8, i)
        j = jnp.minimum(jl, ccap - 1)
        word = clist_ref[t_idx * ((ccap + 1) // 2) + j // 2]
        ci16 = jnp.where(j % 2 == 0, word & 0xFFFF, (word >> 16) & 0xFFFF)
        ci = jnp.where(block_mode, ci16 * 8 + i % 8, ci16)
        return jnp.where(full, i, ci)

    def chunk_of(i):
        return jnp.minimum(raw_ci(i), n_chunks_total - 1)

    def fresh_of(i):
        return raw_ci(i) < n_chunks_total

    return trip, chunk_of, fresh_of


def _decode_winners(packed, acc, origins, dir_planes, tiles_per_view):
    """Shared post-kernel decode: exact one-shot Möller–Trumbore recompute of
    the winner's t/u/v from its extracted geometry columns (full-width fused
    elementwise XLA), face-id decode, and barycentric attribute
    interpolation. -> (valid, t, u, v, face, attrs)."""
    T = packed.shape[0]
    COLS = acc.shape[1]
    n_attr = (COLS - 10) // 3
    P = packed.shape[-1]
    packed = packed[:, 0, :]
    valid = packed < _big_packed()

    dx, dy, dz = dir_planes
    v0x, v0y, v0z = acc[:, 0], acc[:, 1], acc[:, 2]
    e1x, e1y, e1z = acc[:, 3], acc[:, 4], acc[:, 5]
    e2x, e2y, e2z = acc[:, 6], acc[:, 7], acc[:, 8]
    o = origins.reshape(T // tiles_per_view, 1, 1, 3)
    o = jnp.broadcast_to(
        o, (T // tiles_per_view, tiles_per_view, 1, 3)).reshape(T, 1, 3)
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
    f = jnp.where(valid, acc[:, 9].astype(jnp.int32), -1)

    if n_attr:
        corners = acc[:, 10:].reshape(T, n_attr, 3, P)
        w0 = (1.0 - u - v)[:, None]
        attrs = (corners[:, :, 0] * w0 + corners[:, :, 1] * u[:, None]
                 + corners[:, :, 2] * v[:, None])
        attrs = jnp.moveaxis(attrs, 1, 2)
    else:
        attrs = jnp.zeros((T, P, 0))
    return valid, t, u, v, f, attrs


# ---------------------------------------------------------------------------
# chunk-list kernel: per-tile lists of CHUNK ids (not faces)
# ---------------------------------------------------------------------------
#
# Best of both previous designs. The binned kernel's per-tile FACE lists
# need a huge per-view gather plus top_k sorts over the whole face list
# (70% of the pipeline) and any fixed active-set silently drops candidates.
# The cond-skip kernel scans everything with in-kernel branching, but pays
# ~9k scalar conds per view of pure loop overhead. Here the XLA side bins
# CHUNKS (128 spatially-coherent faces each, thanks to the mesh's Morton
# face order): per-chunk screen bboxes are a 284-wide segment min/max, and
# the per-tile chunk list is a top_k over 284 keys — trivial. The kernel is
# the original dynamic-trip-count loop, but slices the GLOBAL VMEM-resident
# planes at chunk_id*chunk (no gathers, no per-tile blocks). Packed slots
# are list-position*chunk + lane, ascending in face id like the XLA
# reference, so tie-breaks agree exactly.

CHUNK_LIST_CAP = 48  # chunks per tile; SMEM-bounded (ids are packed two per
# int32, so 8192 tiles x 24 words x 4B = 786KB of the 1MB SMEM; tiles
# needing more fall back to the full scan)


def _chunklist_tile_kernel(clist_ref, counts_ref, origins_ref,
                           pack_ref, dir_refs, packed_out, acc_out, *,
                           t_idx, row: int, chunk: int, pblk: int,
                           tiles_per_view: int, ccap: int,
                           n_chunks_total: int):
    """counts[t] >= 0: loop that many listed chunks; -1: scan ALL chunks;
    <= -2: expand the listed Morton-block ids (see _chunk_selector).

    Tie semantics identical to the XLA reference: candidates whose t agrees
    in all but the low 13 mantissa bits tie, and the LOWEST face id wins —
    within a chunk via the lane id in the low bits, across chunks via
    strict masked improvement (lists are ascending in chunk id). Geometry
    rides the pack's rows 0-8 (scene_pack layout), so the sweep is the
    shared _mt_sweep_carry over global VMEM pack slices."""
    count = counts_ref[t_idx]
    # clist packs two 16-bit ids per SMEM word (halves the scalar-memory
    # footprint so more views fit per dispatch); see _chunk_selector for the
    # exact-chunk / block-mode / full-scan counts encoding
    trip, chunk_of, _ = _chunk_selector(clist_ref, t_idx, count, ccap,
                                        n_chunks_total)

    view = t_idx // tiles_per_view
    ox = origins_ref[view, 0]
    oy = origins_ref[view, 1]
    oz = origins_ref[view, 2]

    tie_mask = jnp.int32(~((1 << _IDX_BITS) - 1))  # keep float bits only
    _mt_sweep_carry(
        trip, lambda i: pack_ref[0, :, pl.ds(chunk_of(i) * chunk, chunk)],
        (ox, oy, oz), dir_refs, pblk, packed_out, acc_out, tie_mask, row=row)


def _tiles_per_step(T: int, requested: int | None) -> int:
    """Grid batching factor: sweep G tiles per grid step. MEASURED WORSE
    than 1 on v5e for the streamed kernel (per-tile intercept 6.2 us at G=1
    -> 10.2 us at G=4 on the 584k-tri scan: the per-tile cost is block-
    pipeline work that scales with the out-block bytes, not per-step
    scheduling overhead) — default stays 1; the knob remains for
    experiments on other shapes."""
    if requested is not None:
        assert T % requested == 0, (T, requested)
        return requested
    return 1


@partial(jax.jit, static_argnames=("chunk", "pblk", "interpret",
                                   "tiles_per_view", "ccap",
                                   "tiles_per_step"))
def raster_tiles_pallas_chunklist(
    clist: jax.Array,         # (K*T*ceil(ccap/2),) int32: PAIRS of 16-bit
                              # chunk ids (lo=even slot), ascending per tile
    counts: jax.Array,        # (K*T,) int32 chunks per tile
    origin: jax.Array,        # (K,3)
    pack: jax.Array,          # (COLS, Fp) f32 global scene pack (shared;
                              # geometry rides rows 0-9)
    dir_planes: tuple,        # 3x (K*T, P)
    chunk: int = 128,
    pblk: int = 512,
    interpret: bool = False,
    tiles_per_view: int = 64,
    ccap: int = CHUNK_LIST_CAP,
    tiles_per_step: int | None = None,
):
    T = dir_planes[0].shape[0]
    P = dir_planes[0].shape[1]
    COLS = pack.shape[0]
    Fp = pack.shape[1]
    n_chunks_total = Fp // chunk
    assert chunk <= (1 << _LANE_BITS), chunk
    assert (COLS - 10) % 3 == 0
    pblk = min(pblk, P)  # small tiles: one pixel block
    assert P % pblk == 0, f"tile pixels {P} not divisible by pblk {pblk}"
    G = _tiles_per_step(T, tiles_per_step)
    origins = origin.reshape(-1, 3)

    dir3 = [a.reshape(T, 1, P) for a in dir_planes]
    pack3 = pack.reshape(1, COLS, Fp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # clist, counts, origins (SMEM scalars)
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((1, COLS, Fp), lambda s, c, n, o: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec((G, 1, P), lambda s, c, n, o: (s, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
        ],
        out_specs=(
            pl.BlockSpec((G, 1, P), lambda s, c, n, o: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, COLS, P), lambda s, c, n, o: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )

    def kernel(clist_ref, counts_ref, origins_ref, pack_ref, d0, d1, d2,
               packed_o, acc_o):
        for j in range(G):
            _chunklist_tile_kernel(
                clist_ref, counts_ref, origins_ref, pack_ref,
                (d0, d1, d2), packed_o, acc_o,
                t_idx=pl.program_id(0) * G + j, row=j, chunk=chunk,
                pblk=pblk, tiles_per_view=tiles_per_view, ccap=ccap,
                n_chunks_total=n_chunks_total,
            )

    packed, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((T, COLS, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(clist.astype(jnp.int32), counts.astype(jnp.int32), origins,
      pack3, *dir3)

    return _decode_winners(packed, acc, origins, dir_planes, tiles_per_view)


# ---------------------------------------------------------------------------
# compacting kernel: per-tile face compaction -> dense sweep
# ---------------------------------------------------------------------------
#
# The chunk-list kernel sweeps every face of every admitted chunk against
# every pixel of the tile, but only ~7-25% of those candidate slots hold a
# face whose own screen bbox overlaps the tile (the rest ride along because
# a Morton chunk is 128 faces wide). Since the sweep is VMEM-bandwidth-bound
# on its (pblk, chunk) temporaries, work scales linearly with swept chunks —
# so compact first, sweep dense:
#
#   pass 1 (per admitted chunk, cheap): test the chunk's 128 face bboxes
#     (per-view tile-quantized, packed 4x u8 per int32 plane) against the
#     tile; stream-compact the surviving faces' pack columns into the
#     block-structured staging pack S via two MXU matmuls — an
#     inclusive-count matmul against a lower-triangular ones matrix for the
#     positions, and a windowed (2*chunk, chunk) one-hot contraction for
#     the scatter (_stage_window): per-chunk staging cost is independent of
#     the stage capacity. No per-lane control flow anywhere.
#   pass 2: the usual Möller-Trumbore sweep, but over ceil(staged/128)
#     DENSE chunks sliced from S.
#
# If a tile stages more than SC faces, pass 2 falls back to sweeping the
# admitted chunk list directly (exactness over speed; the winner decode is
# identical either way). Outputs double as accumulators so both passes are
# plain pl.when-guarded ref updates.

STAGE_CAP = 512  # dense staging faces per tile (4 sweep chunks)
STREAMED_STAGE_CAP = 16 * STAGE_CAP  # streamed path: bigger tiles/lists.
# 8192 (VMEM staging ~1.5 MB at COLS~44): on the 584k-tri bench scan the
# staged-faces-per-tile distribution is heavy-tailed (p50 362, p99 9014,
# max 35670 at tile=32) — at 4096 ~12.6 tiles/view fell back to re-sweeping
# their RAW admitted chunk lists (2-5x the dense sweep for exactly the
# densest tiles); 8192 leaves ~3.8/view falling back (~2 ms/view saved)


def _stage_window(pack_cols, mf, base, s_ref, tri_lower, chunk: int,
                  nblk: int):
    """Stream-compact one chunk's masked faces (mf (1, chunk) 0/1) into the
    block-structured staging scratch s_ref ((nblk+1, COLS, chunk); the +1
    spill block absorbs past-capacity writes) at dense slots starting at
    `base`. Positions come from the lower-triangular inclusive-count matmul;
    the scatter window is TWO chunk-aligned blocks — a chunk contributes at
    most `chunk` faces, so slots land in [base, base+chunk) which spans at
    most two blocks. The one-hot contraction and the accumulates touch
    (COLS, 2*chunk) instead of (COLS, stage_cap): staging cost per admitted
    chunk is independent of the stage capacity (the full-width accumulate
    was ~70% of the streamed kernel's time on 584k-tri scans). Returns the
    new base."""
    pos = jax.lax.dot_general(
        mf, tri_lower, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (1, chunk) inclusive hit counts (exact: <= chunk)
    b0 = base // chunk
    off = base - b0 * chunk
    slot_w = off + pos.astype(jnp.int32) - 1  # window slots in [0, 2*chunk)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (2 * chunk, chunk), 0)
    oh = (wiota == slot_w).astype(jnp.float32) * mf  # (2*chunk, chunk)
    contrib = jax.lax.dot_general(
        pack_cols, oh, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (COLS, 2*chunk)
    b0c = jnp.minimum(b0, nblk)
    b1c = jnp.minimum(b0 + 1, nblk)
    s_ref[b0c] = s_ref[b0c] + contrib[:, :chunk]
    s_ref[b1c] = s_ref[b1c] + contrib[:, chunk:]
    return base + jnp.sum(mf).astype(jnp.int32)


def max_views_per_dispatch(tiles_per_view: int, ccap: int | None = None,
                           smem_budget: int = 900_000) -> int:
    """How many views one fused dispatch can carry: the per-tile packed
    chunk-id lists (two u16 ids per int32 word, +count +slack) live in TPU
    scalar memory (~1 MB). Owned here so callers never restate the kernel's
    SMEM word layout."""
    words = (((ccap or CHUNK_LIST_CAP) + 1) // 2) + 2
    return max(1, smem_budget // (tiles_per_view * words * 4))


def _band_mask_and_flags(bb, tx, ty, tile: int, pblk: int, nblocks: int):
    """Decode a (1, chunk) u8-packed bbox plane (lo_tx|hi_tx|lo_by|hi_by —
    x at TILE granularity, y at 8-pixel-row BAND granularity) into the tile
    overlap mask plus per-pixel-block y-occupancy flag rows.

    The flags ride the staging pack as extra rows (one per pass-2 pixel
    block): pass 2 skips staged chunks whose flag row is all-zero for its
    block — winner-exact, the bbox being a superset of coverage. Pixel
    block b covers the tile's row-major pixels [b*pblk, (b+1)*pblk), i.e.
    image rows [ty*tile + b*pblk//tile, ...]; its band range is the
    (possibly unaligned) covering range, so any tile/pblk combination is
    conservative."""
    lo_tx = bb & 0xFF
    hi_tx = (bb >> 8) & 0xFF
    lo_by = (bb >> 16) & 0xFF
    hi_by = (bb >> 24) & 0xFF
    y0 = ty * tile  # traced scalar; band indices are y//8
    m = ((lo_tx <= tx) & (tx <= hi_tx)
         & (lo_by <= (y0 + tile - 1) // 8) & (hi_by >= y0 // 8))
    rows = []
    for b in range(nblocks):
        r0 = (b * pblk) // tile          # static rows within the tile
        r1 = ((b + 1) * pblk - 1) // tile
        fb = m & (lo_by <= (y0 + r1) // 8) & (hi_by >= (y0 + r0) // 8)
        rows.append(fb.astype(jnp.float32))
    return m.astype(jnp.float32), jnp.concatenate(rows, axis=0)


def _compact_tile_kernel(clist_ref, counts_ref, origins_ref, pack_ref,
                         bbox_ref, dir_refs, packed_out, acc_out, s_ref, *,
                         chunk: int, pblk: int, tiles_per_view: int,
                         n1d: int, ccap: int, n_chunks_total: int,
                         stage_cap: int, tile: int):
    t_idx = pl.program_id(0)
    count = counts_ref[t_idx]
    trip, chunk_of, fresh_of = _chunk_selector(clist_ref, t_idx, count, ccap,
                                               n_chunks_total)
    COLS = pack_ref.shape[1]
    P = dir_refs[0].shape[2]
    nblocks = P // pblk

    view = t_idx // tiles_per_view
    tiv = t_idx % tiles_per_view
    ty = tiv // n1d
    tx = tiv % n1d
    ox = origins_ref[view, 0]
    oy = origins_ref[view, 1]
    oz = origins_ref[view, 2]

    tie_mask = jnp.int32(~((1 << _IDX_BITS) - 1))
    big_packed = _big_packed()

    nblk = stage_cap // chunk
    # lazy zeroing: _stage_window ACCUMULATES into S, and pass 2 sweeps the
    # partial tail block, so touched blocks must start zero — but only
    # blocks [0, trip+1) can ever be touched (each admitted chunk stages
    # <= chunk faces; +1 for the two-block scatter window / spill). The
    # unconditional full-(nblk+1) memset measured ~34 us of the compact
    # kernel's 43 us per-tile intercept at stage_cap=4096.
    def _zblk(i, c):
        s_ref[jnp.minimum(i, nblk)] = jnp.zeros(
            (COLS + nblocks, chunk), jnp.float32)
        return c
    jax.lax.fori_loop(0, jnp.minimum(trip + 1, nblk + 1), _zblk, 0)

    # ---- pass 1: stream-compact overlapping faces' pack columns into S ----
    # positions via a lower-triangular inclusive-count matmul; scatter via a
    # windowed one-hot contraction — both MXU, no per-lane control flow
    tri_lower = (
        jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    ).astype(jnp.float32)

    def body1(i, base):
        ci = chunk_of(i)
        bb = bbox_ref[0, 0, pl.ds(ci * chunk, chunk)][None, :]  # (1,chunk)
        mf, flags = _band_mask_and_flags(bb, tx, ty, tile, pblk, nblocks)
        mf = mf * fresh_of(i).astype(mf.dtype)  # skip clamped tail dups
        a = pack_ref[0, :, pl.ds(ci * chunk, chunk)]  # (COLS, chunk)
        a = jnp.concatenate([a, flags], axis=0)
        return _stage_window(a, mf, base, s_ref, tri_lower, chunk, nblk)

    staged = jax.lax.fori_loop(0, trip, body1, jnp.int32(0))
    fallback = staged > stage_cap  # S incomplete: sweep the raw list instead

    # ---- pass 2: Möller-Trumbore sweep over dense (or fallback) chunks ----
    # (both branches write every output pixel exactly once per block)
    @pl.when(jnp.logical_not(fallback))
    def _dense():
        trip2 = (jnp.minimum(staged, stage_cap) + chunk - 1) // chunk
        # zero-padded tail columns are degenerate (e1=e2=0 -> no hit)
        _mt_sweep_carry(trip2, lambda i: s_ref[i], (ox, oy, oz), dir_refs,
                        pblk, packed_out, acc_out, tie_mask,
                        get_flag=lambda i, pb: s_ref[i, pl.ds(COLS + pb, 1)])

    @pl.when(fallback)
    def _fb():
        _mt_sweep_carry(
            trip, lambda i: pack_ref[0, :, pl.ds(chunk_of(i) * chunk, chunk)],
            (ox, oy, oz), dir_refs, pblk, packed_out, acc_out, tie_mask)


@partial(jax.jit, static_argnames=("chunk", "pblk", "interpret",
                                   "tiles_per_view", "n1d", "ccap",
                                   "stage_cap"))
def raster_tiles_pallas_compact(
    clist: jax.Array,         # (K*T*ceil(ccap/2),) int32 packed 16-bit pairs
    counts: jax.Array,        # (K*T,) int32 (-1 scan all; <=-2 block mode)
    origin: jax.Array,        # (K,3)
    pack: jax.Array,          # (COLS, Fp) f32 — VMEM-resident (geometry rides
                              # rows 0-9, like the streamed kernel)
    bbox_words: jax.Array,    # (K, Fp) int32: per-view per-face bboxes,
                              # u8-packed lo_tx|hi_tx|lo_by|hi_by (x at tile
                              # granularity, y at 8-px band granularity —
                              # see _band_mask_and_flags)
    dir_planes: tuple,        # 3x (K*T, P)
    chunk: int = 128,
    pblk: int = 512,
    interpret: bool = False,
    tiles_per_view: int = 64,
    n1d: int = 8,
    ccap: int = CHUNK_LIST_CAP,
    stage_cap: int = STAGE_CAP,
):
    """Chunk-list contract, but with per-tile face compaction: the pixel
    sweep runs over densely staged faces only (see module comment). Same
    results/ties as raster_tiles_pallas_chunklist, bit for bit."""
    T = dir_planes[0].shape[0]
    P = dir_planes[0].shape[1]
    COLS = pack.shape[0]
    Fp = pack.shape[1]
    n_chunks_total = Fp // chunk
    assert chunk <= (1 << _LANE_BITS), chunk
    assert (COLS - 10) % 3 == 0
    assert stage_cap % chunk == 0
    pblk = min(pblk, P)
    assert P % pblk == 0, f"tile pixels {P} not divisible by pblk {pblk}"
    tile = math.isqrt(P)
    assert tile * tile == P, f"non-square tile (P={P})"
    nblocks = P // pblk
    origins = origin.reshape(-1, 3)

    dir3 = [a.reshape(T, 1, P) for a in dir_planes]
    pack3 = pack.reshape(1, COLS, Fp)
    K = bbox_words.shape[0]
    bbox3 = bbox_words.reshape(K, 1, Fp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # clist, counts, origins
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, COLS, Fp), lambda t, c, n, o: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(  # per-view bbox plane (revolves across views)
                (1, 1, Fp),
                lambda t, c, n, o: (t // tiles_per_view, 0, 0),
                memory_space=pltpu.VMEM),
            *[pl.BlockSpec((1, 1, P), lambda t, c, n, o: (t, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P), lambda t, c, n, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COLS, P), lambda t, c, n, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            # + nblocks per-pixel-block y-occupancy flag rows (see
            # _band_mask_and_flags)
            pltpu.VMEM((stage_cap // chunk + 1, COLS + nblocks, chunk),
                       jnp.float32),
        ],
    )

    def kernel(clist_ref, counts_ref, origins_ref, pack_ref, bbox_ref,
               d0, d1, d2, packed_o, acc_o, s_ref):
        _compact_tile_kernel(
            clist_ref, counts_ref, origins_ref, pack_ref, bbox_ref,
            (d0, d1, d2), packed_o, acc_o, s_ref, chunk=chunk, pblk=pblk,
            tiles_per_view=tiles_per_view, n1d=n1d, ccap=ccap,
            n_chunks_total=n_chunks_total, stage_cap=stage_cap, tile=tile,
        )

    packed, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((T, COLS, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(clist.astype(jnp.int32), counts.astype(jnp.int32), origins,
      pack3, bbox3, *dir3)

    return _decode_winners(packed, acc, origins, dir_planes, tiles_per_view)


# ---------------------------------------------------------------------------
# streamed-pack kernel: per-chunk HBM->VMEM DMA, no mesh-size VMEM cap
# ---------------------------------------------------------------------------
#
# The chunk-list kernel keeps the whole scene pack VMEM-resident, capping
# meshes at ~90k faces. This variant leaves the pack in HBM (memory_space
# ANY) and DMAs each listed chunk's (COLS, chunk) slice into a
# double-buffered VMEM scratch, overlapping the next chunk's copy with the
# current chunk's math. The loop nest is chunk-OUTER / pixel-block-inner
# (the per-candidate cross products are computed once per chunk instead of
# once per pixel block), with the output blocks themselves serving as the
# cross-chunk accumulators. Geometry rides the pack's first 9 rows, so the
# 9 separate SoA planes disappear. 19 KB DMAs x ~4 chunks/tile hide well
# behind ~1 ms of per-chunk VPU work.


def _streamed_tile_kernel(clist_ref, counts_ref, origins_ref, pack_hbm,
                          dir_refs, packed_out, acc_out, pack_buf, sem, *,
                          t_idx, row: int, chunk: int, pblk: int,
                          tiles_per_view: int, ccap: int,
                          n_chunks_total: int):
    count = counts_ref[t_idx]
    trip, chunk_of, _ = _chunk_selector(clist_ref, t_idx, count, ccap,
                                        n_chunks_total)
    COLS = pack_buf.shape[1]
    P = dir_refs[0].shape[2]

    view = t_idx // tiles_per_view
    ox = origins_ref[view, 0]
    oy = origins_ref[view, 1]
    oz = origins_ref[view, 2]

    tie_mask = jnp.int32(~((1 << _IDX_BITS) - 1))

    def copy_op(i, buf):
        ci = chunk_of(i)
        # pack is chunk-major (NC, COLS, chunk): one CONTIGUOUS ~20KB burst
        # per chunk — the (COLS, Fp) layout made every DMA a COLS-row
        # strided gather (512B rows, MB strides) costing ~40us/chunk
        return pltpu.make_async_copy(
            pack_hbm.at[ci], pack_buf.at[buf], sem.at[buf],
        )

    def block_start():
        @pl.when(trip > 0)
        def _prologue():
            copy_op(0, 0).start()

    def get_chunk(i):
        buf = jax.lax.rem(i, 2)
        copy_op(i, buf).wait()

        @pl.when(i + 1 < trip)
        def _prefetch():
            copy_op(i + 1, jax.lax.rem(i + 1, 2)).start()

        return pack_buf[buf]

    # each pixel block replays the chunk DMAs (2x traffic) — measured
    # 0.45 us/chunk for the whole DMA+decode machinery vs ~6 us of sweep
    _mt_sweep_carry(trip, get_chunk, (ox, oy, oz), dir_refs, pblk,
                    packed_out, acc_out, tie_mask, block_start=block_start,
                    row=row)


def _streamed_compact_tile_kernel(clist_ref, counts_ref, origins_ref,
                                  pack_hbm, bbox_hbm, dir_refs, packed_out,
                                  acc_out, pack_buf, bbox_buf, s_ref,
                                  sem_p, sem_b, *, t_idx, row: int,
                                  chunk: int, pblk: int,
                                  tiles_per_view: int, n1d: int, ccap: int,
                                  n_chunks_total: int, stage_cap: int,
                                  tile: int):
    """Streamed kernel with per-tile face compaction: pass 1 DMAs each
    admitted chunk's pack slice + bbox block and stream-compacts the faces
    whose tile-quantized bboxes overlap this tile into the dense VMEM
    staging pack S; pass 2 sweeps ceil(staged/chunk) dense chunks from S
    (no DMA). Tiles that stage more than stage_cap faces fall back to the
    plain streamed sweep over the raw chunk list."""
    count = counts_ref[t_idx]
    trip, chunk_of, fresh_of = _chunk_selector(clist_ref, t_idx, count, ccap,
                                               n_chunks_total)
    COLS = pack_buf.shape[1]
    P = dir_refs[0].shape[2]
    nblocks = P // pblk

    view = t_idx // tiles_per_view
    tiv = t_idx % tiles_per_view
    ty = tiv // n1d
    tx = tiv % n1d
    ox = origins_ref[view, 0]
    oy = origins_ref[view, 1]
    oz = origins_ref[view, 2]

    tie_mask = jnp.int32(~((1 << _IDX_BITS) - 1))

    nblk = stage_cap // chunk
    # lazy zeroing: _stage_window ACCUMULATES into S, and pass 2 sweeps the
    # partial tail block, so touched blocks must start zero — but only
    # blocks [0, trip+1) can ever be touched (each admitted chunk stages
    # <= chunk faces; +1 for the two-block scatter window / spill). The
    # unconditional full-(nblk+1) memset measured ~34 us of the compact
    # kernel's 43 us per-tile intercept at stage_cap=4096.
    def _zblk(i, c):
        s_ref[jnp.minimum(i, nblk)] = jnp.zeros(
            (COLS + nblocks, chunk), jnp.float32)
        return c
    jax.lax.fori_loop(0, jnp.minimum(trip + 1, nblk + 1), _zblk, 0)

    def copy_pack(i, buf):
        return pltpu.make_async_copy(
            pack_hbm.at[chunk_of(i)], pack_buf.at[buf], sem_p.at[buf])

    def copy_bbox(i, buf):
        # bbox blocks hold 8 consecutive chunks' words (aligned (8, chunk)
        # DMA tiles); the kernel selects the ci%8 sublane after the copy
        return pltpu.make_async_copy(
            bbox_hbm.at[view, chunk_of(i) // 8], bbox_buf.at[buf],
            sem_b.at[buf])

    tri_lower = (
        jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    ).astype(jnp.float32)

    @pl.when(trip > 0)
    def _prologue():
        copy_pack(0, 0).start()
        copy_bbox(0, 0).start()

    def body1(i, base):
        buf = jax.lax.rem(i, 2)
        copy_pack(i, buf).wait()
        copy_bbox(i, buf).wait()

        @pl.when(i + 1 < trip)
        def _prefetch():
            copy_pack(i + 1, jax.lax.rem(i + 1, 2)).start()
            copy_bbox(i + 1, jax.lax.rem(i + 1, 2)).start()

        ci = chunk_of(i)
        sel = jax.lax.broadcasted_iota(
            jnp.int32, (8, chunk), 0) == jax.lax.rem(ci, 8)
        bb = jnp.sum(jnp.where(sel, bbox_buf[buf], 0), axis=0,
                     keepdims=True)  # (1, chunk)
        mf, flags = _band_mask_and_flags(bb, tx, ty, tile, pblk, nblocks)
        mf = mf * fresh_of(i).astype(mf.dtype)  # skip clamped tail dups
        a = jnp.concatenate([pack_buf[buf], flags], axis=0)
        return _stage_window(a, mf, base, s_ref, tri_lower, chunk, nblk)

    staged = jax.lax.fori_loop(0, trip, body1, jnp.int32(0))
    fallback = staged > stage_cap

    # both branches write every output pixel exactly once per block
    @pl.when(jnp.logical_not(fallback))
    def _dense():
        trip2 = (jnp.minimum(staged, stage_cap) + chunk - 1) // chunk
        _mt_sweep_carry(trip2, lambda i: s_ref[i], (ox, oy, oz), dir_refs,
                        pblk, packed_out, acc_out, tie_mask,
                        get_flag=lambda i, pb: s_ref[i, pl.ds(COLS + pb, 1)],
                        row=row)

    @pl.when(fallback)
    def _fb():
        # S overflowed: re-stream the admitted chunks and sweep them raw
        def block_start():
            copy_pack(0, 0).start()

        def get_chunk(i):
            buf = jax.lax.rem(i, 2)
            copy_pack(i, buf).wait()

            @pl.when(i + 1 < trip)
            def _prefetch():
                copy_pack(i + 1, jax.lax.rem(i + 1, 2)).start()

            return pack_buf[buf]

        _mt_sweep_carry(trip, get_chunk, (ox, oy, oz), dir_refs, pblk,
                        packed_out, acc_out, tie_mask,
                        block_start=block_start, row=row)


@partial(jax.jit, static_argnames=("chunk", "pblk", "interpret",
                                   "tiles_per_view", "ccap", "n1d",
                                   "stage_cap", "tiles_per_step"))
def raster_tiles_pallas_streamed(
    clist: jax.Array,         # (K*T*ccap,) int32 chunk ids, ascending per tile
    counts: jax.Array,        # (K*T,) int32 (-1 scan all; <=-2 block mode)
    origin: jax.Array,        # (K,3)
    pack: jax.Array,          # (COLS, Fp) f32 — stays in HBM
    dir_planes: tuple,        # 3x (K*T, P)
    chunk: int = 128,
    pblk: int = 512,
    interpret: bool = False,
    tiles_per_view: int = 64,
    ccap: int = CHUNK_LIST_CAP,
    bbox_words: jax.Array | None = None,  # (K, Fp) i32 -> compaction on
    n1d: int = 8,
    stage_cap: int = STREAMED_STAGE_CAP,
    tiles_per_step: int | None = None,
):
    """Same contract/result as raster_tiles_pallas_chunklist but with the
    scene pack streamed from HBM per chunk — no mesh-size VMEM limit.
    When bbox_words (per-view tile-quantized face bboxes) is given, each
    tile stream-compacts overlapping faces into a dense VMEM staging pack
    first and sweeps only dense chunks (same results, bit for bit, for all
    faces past the near plane; a face whose vertices ALL sit within
    z <= 1e-4 m of the camera is never staged — the plain kernel only
    sweeps such faces when a chunkmate happens to admit the chunk, so
    neither kernel renders them dependably)."""
    T = dir_planes[0].shape[0]
    P = dir_planes[0].shape[1]
    COLS = pack.shape[0]
    assert (COLS - 10) % 3 == 0
    n_attr = (COLS - 10) // 3
    # HBM->VMEM chunk DMAs require the sublane (COLS) extent aligned to the
    # f32 tile height of 8; pad with zero rows (winner decode slices back)
    pad_cols = (-COLS) % 8
    if pad_cols:
        pack = jnp.pad(pack, ((0, pad_cols), (0, 0)))
        COLS += pad_cols
    Fp = pack.shape[1]
    n_chunks_total = Fp // chunk
    assert chunk <= (1 << _LANE_BITS), chunk
    pblk = min(pblk, P)  # small tiles: one pixel block
    assert P % pblk == 0, f"tile pixels {P} not divisible by pblk {pblk}"
    tile = math.isqrt(P)
    assert tile * tile == P, f"non-square tile (P={P})"
    nblocks = P // pblk
    G = _tiles_per_step(T, tiles_per_step)
    origins = origin.reshape(-1, 3)

    dir3 = [a.reshape(T, 1, P) for a in dir_planes]
    # chunk-major: (NC, COLS, chunk) so each chunk is one contiguous block
    pack3 = pack.reshape(COLS, n_chunks_total, chunk).transpose(1, 0, 2)

    # VMEM budget check (~16 MB/core on v5e): the staging scratch grows
    # linearly with the vertex-attribute count ((stage_cap/chunk+1) x COLS x
    # chunk f32) and would otherwise only fail at Mosaic compile time with
    # an opaque error. 2x on the dir/out blocks: pallas double-buffers
    # grid-mapped blocks.
    compacting = bbox_words is not None
    stage_rows = (stage_cap // chunk + 1) if compacting else 0
    vmem_est = 4 * (
        2 * COLS * chunk                  # pack_buf double buffer
        + stage_rows * (COLS + nblocks) * chunk  # compaction staging scratch
        + (2 * 8 * chunk if compacting else 0)  # bbox_buf
        + 2 * G * (3 * P)                 # dir blocks
        + 2 * G * (1 + COLS) * P          # packed + acc out blocks
    )
    assert vmem_est <= 12 * 1024 * 1024, (
        f"streamed raster kernel needs ~{vmem_est / 1e6:.1f} MB of VMEM "
        f"(limit ~16 MB): lower stage_cap (={stage_cap}), the tile size "
        f"(P={P}) or the vertex-attribute count (COLS={COLS})"
    )
    extra_in, extra_scratch = [], []
    if compacting:
        assert stage_cap % chunk == 0
        K = bbox_words.shape[0]
        # 8-chunk-aligned DMA blocks: (K, ceil(NC/8), 8, chunk); the kernel
        # selects the ci%8 sublane after the copy
        ncb = -(-n_chunks_total // 8)
        bb = jnp.pad(bbox_words.astype(jnp.int32),
                     ((0, 0), (0, ncb * 8 * chunk - Fp)))
        bbox4 = bb.reshape(K, ncb, 8, chunk)
        extra_in = [bbox4]
        extra_scratch = [
            pltpu.VMEM((2, 8, chunk), jnp.int32),
            # + nblocks per-pixel-block y-occupancy flag rows
            pltpu.VMEM((stage_cap // chunk + 1, COLS + nblocks, chunk),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pack stays off-chip
            *([pl.BlockSpec(memory_space=pl.ANY)] if compacting else []),
            *[pl.BlockSpec((G, 1, P), lambda s, c, n, o: (s, 0, 0),
                           memory_space=pltpu.VMEM) for _ in range(3)],
        ],
        out_specs=(
            pl.BlockSpec((G, 1, P), lambda s, c, n, o: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, COLS, P), lambda s, c, n, o: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, COLS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            *extra_scratch,
        ],
    )

    if compacting:
        def kernel(clist_ref, counts_ref, origins_ref, pack_ref, bbox_ref,
                   d0, d1, d2, packed_o, acc_o, pack_buf, sem_p, bbox_buf,
                   s_ref, sem_b):
            for j in range(G):
                _streamed_compact_tile_kernel(
                    clist_ref, counts_ref, origins_ref, pack_ref, bbox_ref,
                    (d0, d1, d2), packed_o, acc_o, pack_buf, bbox_buf, s_ref,
                    sem_p, sem_b, t_idx=pl.program_id(0) * G + j, row=j,
                    chunk=chunk, pblk=pblk,
                    tiles_per_view=tiles_per_view, n1d=n1d, ccap=ccap,
                    n_chunks_total=n_chunks_total, stage_cap=stage_cap,
                    tile=tile,
                )
    else:
        def kernel(clist_ref, counts_ref, origins_ref, pack_ref, d0, d1, d2,
                   packed_o, acc_o, pack_buf, sem):
            for j in range(G):
                _streamed_tile_kernel(
                    clist_ref, counts_ref, origins_ref, pack_ref,
                    (d0, d1, d2), packed_o, acc_o, pack_buf, sem,
                    t_idx=pl.program_id(0) * G + j, row=j, chunk=chunk,
                    pblk=pblk, tiles_per_view=tiles_per_view, ccap=ccap,
                    n_chunks_total=n_chunks_total,
                )

    packed, acc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, P), jnp.int32),
            jax.ShapeDtypeStruct((T, COLS, P), jnp.float32),
        ),
        grid_spec=grid_spec,
        # wide attr packs blow Mosaic's default 16M scoped-vmem stack (the
        # chunk-outer body keeps every pixel block's temporaries live)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(clist.astype(jnp.int32), counts.astype(jnp.int32), origins,
      pack3, *extra_in, *dir3)

    if pad_cols:
        acc = acc[:, : COLS - pad_cols]
    return _decode_winners(packed, acc, origins, dir_planes, tiles_per_view)
