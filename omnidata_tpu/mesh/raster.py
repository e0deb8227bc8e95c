"""Tile-binned ray-cast renderer: one pass per camera batch emits every
geometric label the reference needs four separate Blender renders for
(SURVEY.md §7 layer 2): z-buffer depth, euclidean depth, face ids
(fragments), barycentrics and the valid mask — normals/colors/labels are
gathered from the fragments afterwards (shade.py).

Two-level structure:
1. **Bin**: project all triangles, compute conservative screen bboxes, build a
   fixed-capacity per-tile triangle list (``jnp.nonzero(size=cap)``).
2. **Rasterize**: per tile, scan the (pre-gathered) triangle list in chunks
   and intersect against the tile's pixel rays, carrying only the closest
   (t, face) per pixel; barycentrics are recomputed once at the end for the
   winning triangle.

TPU-first layout decisions (these are the difference between ~60 GFLOP/s and
VPU-saturating throughput):
- SoA everywhere: xyz components are separate (tiles, chunk) planes, so every
  elementwise op runs on full 128-wide lanes (an (...,3) trailing axis wastes
  125 of 128 lanes).
- triangle data is gathered from HBM once per view into (tiles, cap) planes;
  the chunk loop only slices (fast) — no gathers in the hot loop.
- the hot loop's only materialized arrays are (tiles, pixels) carries; the
  (tiles, pixels, chunk) intermediates exist solely inside fused
  multiply-add + min/argmin reduction kernels.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cameras import Camera, camera_rays, extrinsic_RT, intrinsic_matrix
from .mesh import TriangleMesh

_BIG = 1e30
_NEAR = 1e-4
_EPS = 1e-7
_EDGE_EPS = 1e-5

# meshes with more chunks than this use two-stage (block -> chunk) admission
# lists; below it the flat per-chunk top_k is cheap enough (tests lower it
# to exercise the hierarchical path on small meshes)
HIER_ADMISSION_MIN_CHUNKS = 1024


class Fragments(NamedTuple):
    """Per-pixel geometry buffers for one view (all (H,W) unless noted).

    t: euclidean distance along the ray (the reference's depth_euclidean
       source) · z: distance along the camera forward axis (depth_zbuffer) ·
    face: hit face index or -1 · bary: (H,W,2) barycentric (u,v) ·
    valid: hit mask (mask_valid)."""

    t: jax.Array
    z: jax.Array
    face: jax.Array
    bary: jax.Array
    valid: jax.Array


def _project_all(K, RT, pts):
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    cam = jnp.einsum("ij,nj->ni", RT, jnp.concatenate([pts, ones], -1),
                     precision="highest")
    zc = cam[:, 2]
    safe_z = jnp.where(jnp.abs(zc) < _NEAR, _NEAR, zc)
    uvw = jnp.einsum("ij,nj->ni", K, cam, precision="highest")
    uv = uvw[:, :2] / safe_z[:, None]
    return uv, zc


def face_screen_bboxes(camera: Camera, mesh: TriangleMesh,
                       tris_w: jax.Array | None = None):
    """Conservative per-face screen bboxes (lo, hi (F,2)) + live mask (F,).

    Near-plane-aware: triangles entirely behind z=near can never be hit and
    are dead; triangles straddling the plane get a bbox over their in-front
    vertices plus the two edge/near-plane crossings (exact conservative
    bound — without this, interior views bin ~half the mesh to every tile).
    Dead faces carry lo=+BIG / hi=-BIG so any overlap test fails.

    tris_w: optional pre-gathered (F, 3, 3) world-space triangle corners.
    Batched callers MUST pass it: mesh.vertices[mesh.faces] inside a
    per-view vmap re-runs a 3F-row gather per view, which measured ~17
    ms/view on the 584k-face scan (the single largest stage after the r4
    kernel fix); gathered once outside, the projection is a pure einsum."""
    res = camera.resolution
    K = intrinsic_matrix(camera.fov, res)
    RT = extrinsic_RT(camera.location, camera.R)

    if tris_w is None:
        tris_w = mesh.vertices[mesh.faces]  # (F,3,3)
    ones = jnp.ones(tris_w.shape[:-1] + (1,), tris_w.dtype)
    tri_cam = jnp.einsum(
        "ij,fvj->fvi", RT, jnp.concatenate([tris_w, ones], -1),
        precision="highest",
    )  # (F,3,3)
    tri_z = tri_cam[..., 2]  # (F,3)

    def to_uv(pts_cam):
        uvw = jnp.einsum("...j,ij->...i", pts_cam, K, precision="highest")
        zz = jnp.maximum(uvw[..., 2], _NEAR)
        return uvw[..., :2] / zz[..., None]

    front = tri_z > _NEAR  # (F,3)
    any_front = jnp.any(front, -1)
    uv_v = to_uv(tri_cam)  # (F,3,2) — garbage where behind; masked below

    # edge/near-plane crossings for the 3 edges (i, i+1)
    BIGF = 1e9
    lo = jnp.full((mesh.faces.shape[0], 2), BIGF)
    hi = jnp.full((mesh.faces.shape[0], 2), -BIGF)
    for i in range(3):
        m = front[:, i : i + 1]
        lo = jnp.minimum(lo, jnp.where(m, uv_v[:, i], BIGF))
        hi = jnp.maximum(hi, jnp.where(m, uv_v[:, i], -BIGF))
        j = (i + 1) % 3
        a, b = tri_cam[:, i], tri_cam[:, j]
        za, zb = tri_z[:, i], tri_z[:, j]
        crosses = (za > _NEAR) != (zb > _NEAR)
        tcl = (_NEAR - za) / jnp.where(zb == za, 1.0, zb - za)
        pc = a + tcl[:, None] * (b - a)
        pc = pc.at[:, 2].set(_NEAR)
        uv_c = to_uv(pc)
        cm = crosses[:, None]
        lo = jnp.minimum(lo, jnp.where(cm, uv_c, BIGF))
        hi = jnp.maximum(hi, jnp.where(cm, uv_c, -BIGF))

    F = mesh.faces.shape[0]
    live = (jnp.arange(F) < mesh.num_faces) & any_front
    # screen-frustum reject: bbox entirely off screen
    on_screen = (hi[:, 0] >= 0) & (lo[:, 0] <= res) & (hi[:, 1] >= 0) & (lo[:, 1] <= res)
    live = live & on_screen
    lo = jnp.where(live[:, None], lo, BIGF)
    hi = jnp.where(live[:, None], hi, -BIGF)
    return lo, hi, live


def bin_triangles(camera: Camera, mesh: TriangleMesh, tile: int, cap: int):
    """Per-tile triangle lists (T, cap) + per-tile candidate counts (T,).

    Candidate-complete up to `cap` faces AND 256 chunks per tile: candidates
    come from per-tile lists of overlapping 128-face Morton chunks (chunk
    bboxes -> a top_k over F/128 keys), then a face-level overlap test +
    top_k over only the listed chunks' faces. This keeps the sort width at
    256*128 instead of F — an earlier revision keyed a (T, F) matrix, which
    is a ~1 GB sort per view on million-face scans (exactly the meshes this
    XLA path serves as the big-mesh fallback). Lowest face ids win on
    overflow; raise cap / RASTER_CAP for dense meshes (check counts)."""
    res = camera.resolution
    n_tiles_1d = res // tile
    T = n_tiles_1d * n_tiles_1d
    lo, hi, live = face_screen_bboxes(camera, mesh)
    F = mesh.faces.shape[0]
    chunk = 128
    n_chunks = -(-F // chunk)
    Fp = n_chunks * chunk
    padF = Fp - F
    BIGF = 1e9
    lo = jnp.pad(lo, ((0, padF), (0, 0)), constant_values=BIGF)
    hi = jnp.pad(hi, ((0, padF), (0, 0)), constant_values=-BIGF)

    # level 1: per-tile lists of overlapping chunks (chunk-union bboxes)
    clo = lo.reshape(n_chunks, chunk, 2).min(1)
    chi = hi.reshape(n_chunks, chunk, 2).max(1)
    txs = jnp.arange(n_tiles_1d) * tile
    cov_x = (chi[:, 0:1] >= txs[None]) & (clo[:, 0:1] <= txs[None] + tile)
    cov_y = (chi[:, 1:2] >= txs[None]) & (clo[:, 1:2] <= txs[None] + tile)
    cov = (cov_y[:, :, None] & cov_x[:, None, :]).reshape(n_chunks, T).T  # (T,NC)
    ccap = min(256, n_chunks)
    ci_iota = jnp.arange(n_chunks, dtype=jnp.int32)
    ckeys = jnp.where(cov, 2 * n_chunks - ci_iota[None], -ci_iota[None])
    cvals, cidx = jax.lax.top_k(ckeys, ccap)  # ascending chunk ids first
    clist = jnp.where(cvals > n_chunks, cidx, n_chunks - 1)  # (T, ccap)

    # level 2: face-level overlap + top_k over only the listed chunks' faces
    fids = (clist[:, :, None] * chunk
            + jnp.arange(chunk, dtype=jnp.int32)[None, None]).reshape(T, -1)
    A = ccap * chunk
    flo = lo[fids]  # (T, A, 2)
    fhi = hi[fids]
    ty = jnp.repeat(txs, n_tiles_1d)
    tx = jnp.tile(txs, n_tiles_1d)
    ov = (
        (fhi[..., 0] >= tx[:, None]) & (flo[..., 0] <= tx[:, None] + tile)
        & (fhi[..., 1] >= ty[:, None]) & (flo[..., 1] <= ty[:, None] + tile)
    )  # (T, A)
    counts = jnp.sum(ov, 1)

    a_iota = jnp.arange(A, dtype=jnp.int32)
    keys = jnp.where(ov, 2 * A - a_iota[None], -a_iota[None])
    k = min(cap, A)
    vals, idx = jax.lax.top_k(keys, k)  # (T,k) — indices into the A axis
    tile_tris = jnp.where(
        vals > A, jnp.take_along_axis(fids, idx, 1), F - 1
    ).astype(jnp.int32)
    # padded face ids (>= F) are degenerate; map them to the F-1 pad slot
    tile_tris = jnp.where(tile_tris >= mesh.num_faces, F - 1, tile_tris)
    if k < cap:  # tiny meshes: pad the capacity with degenerate slots
        pad = jnp.full((T, cap - k), F - 1, jnp.int32)
        tile_tris = jnp.concatenate([tile_tris, pad], 1)
    return tile_tris, counts


@partial(jax.jit, static_argnames=("tile",))
def tile_candidate_counts(camera: Camera, mesh: TriangleMesh, tile: int = 64):
    """True per-tile bbox-overlap face counts (T,) — the overflow probe for
    capacity-bound consumers. render_view silently keeps only the lowest
    `cap` face ids per tile on overflow (raster.py bin_triangles), so exact
    callers on the XLA path fetch max(counts) and raise cap before
    rendering (annotator.cli does); the Pallas kernels instead get
    exactness from their counts=-1 scan-all contract. Counts here are an
    upper bound of bin_triangles' (its chunk-level pre-admission can only
    remove candidates)."""
    res = camera.resolution
    n1d = res // tile
    lo, hi, _live = face_screen_bboxes(camera, mesh)
    txs = jnp.arange(n1d) * tile
    ovx = (hi[:, 0:1] >= txs[None]) & (lo[:, 0:1] <= txs[None] + tile)
    ovy = (hi[:, 1:2] >= txs[None]) & (lo[:, 1:2] <= txs[None] + tile)
    cnt = jnp.einsum("fy,fx->yx", ovy.astype(jnp.float32),
                     ovx.astype(jnp.float32), precision="highest")
    return cnt.reshape(-1).astype(jnp.int32)


def _tri_soa(mesh: TriangleMesh):
    """9 (F,) planes: v0.xyz, e1.xyz, e2.xyz."""
    tris = mesh.vertices[mesh.faces]  # (F,3,3)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    return (
        v0[:, 0], v0[:, 1], v0[:, 2],
        e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2],
    )


@partial(jax.jit, static_argnames=("tile", "cap", "chunk", "parallel_tiles"))
def render_view(
    camera: Camera,
    mesh: TriangleMesh,
    tile: int = 64,
    cap: int = 2048,
    chunk: int = 128,
    parallel_tiles: bool = True,
) -> Fragments:
    """Render one camera view to Fragments. resolution must be divisible by
    ``tile``; cap bounds triangles per tile (overflow drops extra candidates —
    raise cap for dense meshes; see bin_triangles counts). parallel_tiles is
    accepted for API stability (the SoA kernel always runs tiles in parallel)."""
    del parallel_tiles
    res = camera.resolution
    n1d = res // tile
    T = n1d * n1d
    P = tile * tile

    tile_tris, _ = bin_triangles(camera, mesh, tile, cap)  # (T,cap)

    origin, dirs = camera_rays(camera)  # (3,), (H,W,3)
    tile_dirs = (
        dirs.reshape(n1d, tile, n1d, tile, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(T, P, 3)
    )
    dx, dy, dz = tile_dirs[..., 0], tile_dirs[..., 1], tile_dirs[..., 2]  # (T,P)
    ox, oy, oz = origin[0], origin[1], origin[2]

    soa = _tri_soa(mesh)
    # One gather per view: (T, cap) planes; the chunk loop only slices.
    g = [a[tile_tris] for a in soa]

    n_chunks = cap // chunk

    assert cap <= 8192, "global candidate slot must fit in 13 mantissa bits"

    def body(carry, ci):
        best_packed, best_j = carry  # (T,P) int32 packed t|idx, (T,P) idx into cap
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * chunk, chunk, axis=1)
        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (sl(a) for a in g)  # (T,C)

        # Möller–Trumbore in the same factored form as the Pallas kernel
        # (pallas_raster.py) so both paths make bit-identical hit/ordering
        # decisions: the ray-independent cross products n = e1×e2,
        # q = tvec×e1, r = e2×tvec live on (T,1,C) planes and the per-pixel
        # work is 9 fused multiply-adds.
        tvx = (ox - v0x)[:, None, :]
        tvy = (oy - v0y)[:, None, :]
        tvz = (oz - v0z)[:, None, :]
        e1x, e1y, e1z = e1x[:, None], e1y[:, None], e1z[:, None]
        e2x, e2y, e2z = e2x[:, None], e2y[:, None], e2z[:, None]
        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        rx = e2y * tvz - e2z * tvy
        ry = e2z * tvx - e2x * tvz
        rz = e2x * tvy - e2y * tvx
        e2q = e2x * qx + e2y * qy + e2z * qz  # (T,1,C)

        Dx, Dy, Dz = dx[:, :, None], dy[:, :, None], dz[:, :, None]
        det = -(Dx * nx + Dy * ny + Dz * nz)  # (T,P,C)
        udet = Dx * rx + Dy * ry + Dz * rz
        vdet = Dx * qx + Dy * qy + Dz * qz
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
        t = jnp.where(hit, ts / jnp.maximum(adet, _EPS * _EPS), _BIG)  # (T,P,C)
        # One fused min-reduction: for positive floats the int32 bit pattern
        # is order-preserving, so pack the *global* candidate slot into the
        # low 13 mantissa bits (cap <= 8192; ~1e-3 relative t error, far
        # below the 1/512 m label quantization; exact t is recomputed for
        # the winner after the loop). Identical packing (width included) to
        # the Pallas kernel so both paths pick identical winners.
        ti = jax.lax.bitcast_convert_type(t, jnp.int32)
        slot = jax.lax.broadcasted_iota(jnp.int32, t.shape, 2) + ci * chunk
        packed = (ti & ~jnp.int32(0x1FFF)) | slot
        pj = jnp.min(packed, -1)  # (T,P)
        closer = pj < best_packed
        best_j = jnp.where(closer, pj & 0x1FFF, best_j)
        best_packed = jnp.minimum(best_packed, pj)
        return (best_packed, best_j), None

    BIG_PACKED = jax.lax.bitcast_convert_type(jnp.float32(_BIG), jnp.int32) & ~jnp.int32(0x1FFF)
    init = (jnp.full((T, P), BIG_PACKED, jnp.int32), jnp.zeros((T, P), jnp.int32))
    (packed, jbest), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    valid = packed < BIG_PACKED

    # winning face ids + one-shot exact t/barycentric recompute for winners
    f = jnp.take_along_axis(tile_tris, jbest.reshape(T, P), axis=1)  # (T,P)
    f = jnp.where(valid, f, -1)

    fi = jnp.maximum(f, 0)
    w = [a[fi] for a in soa]  # (T,P) planes for the winning triangle
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = w
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) < _EPS, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    u = (tvx * px + tvy * py + tvz * pz) * inv
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    t = jnp.where(valid, t, _BIG)
    uv = jnp.stack([u, v], -1)  # (T,P,2)

    def untile(x):
        shp = x.shape[2:]
        return (
            x.reshape(n1d, n1d, tile, tile, *shp)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(shp)))
            .reshape(res, res, *shp)
        )

    t_img = untile(t)
    f_img = untile(f)
    uv_img = untile(uv)
    valid_img = untile(valid)

    forward = camera.R @ jnp.asarray([0.0, 0.0, -1.0])
    cosang = jnp.einsum("hwc,c->hw", dirs, forward, precision="highest")
    z_img = jnp.where(valid_img, t_img * cosang, _BIG)
    return Fragments(
        t=jnp.where(valid_img, t_img, _BIG),
        z=z_img,
        face=f_img,
        bary=uv_img,
        valid=valid_img,
    )


def render_views(cameras: Camera, mesh: TriangleMesh, tile: int = 64,
                 cap: int = 2048, chunk: int = 128,
                 parallel_tiles: bool = True) -> Fragments:
    """vmap of render_view over a leading camera batch dimension."""
    return jax.vmap(
        lambda loc, R, fov: render_view(
            Camera(loc, R, fov, cameras.resolution), mesh, tile, cap, chunk,
            parallel_tiles,
        )
    )(cameras.location, cameras.R, cameras.fov)


def scene_pack(mesh: TriangleMesh, attrs: tuple = ()) -> jax.Array:
    """(F, 10 + 3*C) packed per-face columns: v0/e1/e2 xyz, the face id (as
    f32 — exact below 2^24), then (a0, a1, a2) corner values per attribute
    channel.

    One *row* gather of this pack per view replaces 10 + 3C separate scalar-
    plane gathers: TPU gathers pay per fetched row, so packing the columns
    amortizes the fetch across lanes (measured ~equal cost for 9 vs 40
    columns). Camera-independent — computed once per (mesh, attrs) program.
    The pallas kernel extracts the winner's row with a one-hot matmul
    (pallas_raster.py), which is why the face id rides along as a column."""
    F = mesh.faces.shape[0]
    tris = mesh.vertices[mesh.faces]  # (F,3,3) row gather
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    cols = [v0, e1, e2, jnp.arange(F, dtype=jnp.float32)[:, None]]
    for a in attrs:
        ca = a[mesh.faces]  # (F,3,C) row gather
        cols.append(jnp.swapaxes(ca, 1, 2).reshape(F, -1))  # (F,3C)
    return jnp.concatenate(cols, 1)


EXPAND_BCAP = 32  # hier stage-2 sort width = 8*EXPAND_BCAP candidate chunks


def admission_lists(overlap, true_counts, ccap: int, hier: bool,
                    expand_bcap: int | None = None):
    """Per-tile ascending chunk-id lists from the (rows, n_chunks) overlap
    matrix. Returns (ids (rows, ccap), counts (rows,)); counts == -1 marks
    overflow rows where the kernel scans all chunks instead. On the hier
    path, overflow rows whose 8-chunk Morton-BLOCK list still fits ccap get
    counts = -(bcount)-2 and ids holding ascending block ids — the kernel
    expands each block to its 8 chunks (pallas_raster._chunk_selector),
    which is winner-exact (extra chunks in an admitted block stage/hit
    nothing) and 12-24x cheaper than the scan-all cliff: on the 584k-tri
    bench scan a ccap-192 overflow tile scans ~190 block-expanded chunks
    instead of all 4570 (~26 ms of sweep for ONE tile).

    hier=False: one exact top_k over the full key matrix.
    hier=True: hierarchical exact admission — lax.top_k over the full
    (rows, n_chunks) key matrix is a near-full sort; on a 584k-face scan
    (4570 chunks x 2048 tile rows) it dominated the whole render (~9.4M
    keys/dispatch). Two stages cut the sorted width while staying
    candidate-complete: (1) top_k over 8-chunk Morton BLOCKS (any-overlap),
    (2) exact per-chunk top_k over only the FIRST expand_bcap admitted
    blocks' expanded chunk ids. Rows with more than expand_bcap admitted
    blocks take BLOCK MODE (counts = -bcount-2, winner-exact, see above)
    instead of an exact list — on the bench scan bcount is p50 3 / p99 20 /
    max 29 per tile, so expand_bcap=32 makes stage 2 sort 256-wide instead
    of ccap*8=1536-wide (admission measured 4.7 -> ~2 ms/view) with zero
    block-mode rows; scattered-geometry scenes degrade to block mode, not
    to the scan-all cliff (that needs bcount > ccap too).

    Both paths produce IDENTICAL ids/counts for rows where the hier path
    returns an exact list (counts >= 0; tests compare them directly)."""
    rows, n_chunks = overlap.shape
    counts = jnp.where(true_counts > ccap, -1, true_counts)
    if not hier:
        ci_iota = jnp.arange(n_chunks, dtype=jnp.int32)
        keys = jnp.where(overlap, 2 * n_chunks - ci_iota, -ci_iota)
        vals, idx = jax.lax.top_k(keys, min(ccap, n_chunks))
        ids = jnp.where(vals > n_chunks, idx, 0)  # ascending chunk ids first
        if n_chunks < ccap:
            ids = jnp.pad(ids, ((0, 0), (0, ccap - n_chunks)))
        return ids, counts
    ab = 8
    ncb = -(-n_chunks // ab)
    ovb = jnp.pad(overlap, ((0, 0), (0, ncb * ab - n_chunks)))
    ovb_any = ovb.reshape(rows, ncb, ab).any(-1)
    bcount = ovb_any.sum(-1)
    bcap = min(ccap, ncb)
    bi = jnp.arange(ncb, dtype=jnp.int32)
    bkeys = jnp.where(ovb_any, 2 * ncb - bi, -bi)
    bvals, bidx = jax.lax.top_k(bkeys, bcap)  # ascending block ids first
    blist = jnp.where(bvals > ncb, bidx, ncb)  # pad -> zero-bit sentinel
    if expand_bcap is None:
        expand_bcap = EXPAND_BCAP
    assert expand_bcap >= 1, expand_bcap
    bcap2 = min(bcap, expand_bcap)
    cand = (blist[:, :bcap2, None] * ab
            + jnp.arange(ab, dtype=jnp.int32)).reshape(rows, bcap2 * ab)
    ov2p = jnp.pad(overlap, ((0, 0), (0, (ncb + 1) * ab - n_chunks)))
    ovc = jnp.take_along_axis(ov2p, cand, axis=1)  # (rows, bcap2*ab)
    ca = bcap2 * ab
    ai = jnp.arange(ca, dtype=jnp.int32)
    keys2 = jnp.where(ovc, 2 * ca - ai, -ai)
    k2 = min(ccap, ca)
    vals2, idx2 = jax.lax.top_k(keys2, k2)
    ids = jnp.where(vals2 > ca, jnp.take_along_axis(cand, idx2, 1), 0)
    if k2 < ccap:
        ids = jnp.pad(ids, ((0, 0), (0, ccap - k2)))
    # exact list only when every admitted block was expanded AND the chunk
    # count fits; block mode (ascending block ids, bvals carries the same
    # real-first ordering trick) when the block list fits; else scan-all
    ids_block = jnp.where(bvals > ncb, bidx, 0)
    if bcap < ccap:
        ids_block = jnp.pad(ids_block, ((0, 0), (0, ccap - bcap)))
    exact = (true_counts <= k2) & (bcount <= bcap2)
    block_mode = ~exact & (bcount <= bcap)
    ids = jnp.where(block_mode[:, None], ids_block, ids)
    counts = jnp.where(
        exact,
        true_counts,
        jnp.where(bcount <= bcap, -bcount - 2, -1),
    )
    return ids, counts


@partial(jax.jit, static_argnames=("tile", "cap", "chunk", "interpret",
                                   "ccap", "streamed", "compact",
                                   "stage_cap", "hier_min_chunks",
                                   "max_views_per_kernel", "expand_bcap"))
def render_views_fused(
    cameras: Camera,
    mesh: TriangleMesh,
    tile: int = 64,
    cap: int = 1024,
    chunk: int = 128,
    interpret: bool = False,
    vertex_attrs: jax.Array | None = None,
    ccap: int | None = None,
    streamed: bool = False,
    compact: bool | None = None,
    stage_cap: int | None = None,
    hier_min_chunks: int | None = None,
    max_views_per_kernel: int | None = None,
    expand_bcap: int | None = None,
):
    """Batched Pallas render: K cameras in ONE kernel dispatch (grid K*T),
    with optional in-kernel vertex-attribute interpolation.

    Candidate admission is by CHUNK (128 Morton-ordered faces): per tile,
    the overlapping chunk ids are computed from per-chunk screen bboxes (a
    284-wide top_k - trivial vs the per-face sorts the binned design
    needed) and the kernel slices the global VMEM-resident planes at each
    listed chunk. Capacity is CHUNK_LIST_CAP chunks/tile (= 4096 candidate
    faces with room spread); `cap` is accepted for API stability and
    ignored.

    cameras: Camera with a leading batch dim on location/R/fov.
    Returns batched Fragments (K,H,W,...) — and (Fragments, attr_img
    (K,H,W,C)) when vertex_attrs (V,C) is given."""
    from .pallas_raster import (
        CHUNK_LIST_CAP,
        STAGE_CAP,
        STREAMED_STAGE_CAP,
        raster_tiles_pallas_chunklist,
        raster_tiles_pallas_compact,
        raster_tiles_pallas_streamed,
    )

    # VMEM ceiling: the chunk-list kernel keeps the full scene pack + SoA
    # planes resident (13 + COLS planes x Fp x 4B). Past ~8 MB of pack the
    # program doesn't fit v5e VMEM. On TPU, big scans auto-route to the
    # HBM-streamed kernel (per-chunk DMA, no mesh-size cap); on CPU (where
    # Mosaic DMA programs only run in interpret mode) they fall back to the
    # capacity-knobbed XLA path so huge scans still render everywhere.
    n_attr_ch = 0 if vertex_attrs is None else vertex_attrs.shape[1]
    pack_bytes = mesh.faces.shape[0] * (10 + 3 * n_attr_ch + 13) * 4
    if pack_bytes > 8 * 1024 * 1024 and not streamed and not interpret:
        if jax.default_backend() == "tpu":
            streamed = True
    if pack_bytes > 8 * 1024 * 1024 and not streamed:
        frag = render_views(cameras, mesh, tile, max(cap, 4096), chunk)
        if vertex_attrs is None:
            return frag
        from .shade import interpolate_vertex_attribute

        attr_img = jax.vmap(
            lambda f: interpolate_vertex_attribute(f, mesh, vertex_attrs)
        )(frag)
        return frag, attr_img

    if compact is None:
        # measured on v5e: per-tile face compaction wins when the admitted
        # chunk lists are long (584k-tri scan: 230 -> 174 ms/view streamed)
        # but its staging pass costs more than it saves on short lists
        # (39.7k-tri scene, ~3 chunks/tile: 7.2 -> 24.9 ms/view), so it is
        # on by default only for the streamed (big-scan) path
        compact = streamed

    del cap
    res = cameras.resolution
    n1d = res // tile
    T = n1d * n1d
    P = tile * tile
    K = cameras.location.shape[0]
    F = mesh.faces.shape[0]
    n_chunks = -(-F // chunk)
    Fp = n_chunks * chunk
    padF = Fp - F
    ccap = min(ccap or CHUNK_LIST_CAP, n_chunks)

    # per-view per-face conservative bboxes -> FACE-granular chunk admission:
    # a chunk is listed for a tile only if >= 1 of its faces' own bboxes
    # overlaps the tile (the chunk-union bbox admits ~1.3x more chunks whose
    # overlapping region contains none of the chunk's actual faces). The
    # per-chunk any-face-overlap is a separable y/x test contracted on the
    # MXU: overlap[c,ty,tx] = OR_f (ov_y[c,f,ty] & ov_x[c,f,tx]) == matmul>0.
    tris = mesh.vertices[mesh.faces]  # gathered ONCE, shared by all views
    lo, hi, _live = jax.vmap(
        lambda loc, R, fov: face_screen_bboxes(
            Camera(loc, R, fov, res), mesh, tris_w=tris)
    )(cameras.location, cameras.R, cameras.fov)
    BIGF = 1e9
    lo = jnp.pad(lo, ((0, 0), (0, padF), (0, 0)), constant_values=BIGF)
    hi = jnp.pad(hi, ((0, 0), (0, padF), (0, 0)), constant_values=-BIGF)

    txs = jnp.arange(n1d) * tile
    ov_x = (hi[..., 0:1] >= txs[None, None]) & (lo[..., 0:1] <= txs[None, None] + tile)
    ov_y = (hi[..., 1:2] >= txs[None, None]) & (lo[..., 1:2] <= txs[None, None] + tile)
    # bf16 inputs: {0,1} are exact, the MXU accumulates in f32 (the
    # preferred_element_type), and the transient (K, Fp, n1d) admission
    # tensors halve (they peak at ~150 MB per view-batch on 584k faces)
    ovy_f = ov_y.reshape(K * n_chunks, chunk, n1d).astype(jnp.bfloat16)
    ovx_f = ov_x.reshape(K * n_chunks, chunk, n1d).astype(jnp.bfloat16)
    cnt = jnp.einsum("bfy,bfx->byx", ovy_f, ovx_f,
                     preferred_element_type=jnp.float32)  # (K*NC,Ty,Tx)
    overlap = (cnt > 0).reshape(K, n_chunks, T).transpose(0, 2, 1)  # (K,T,NC)
    true_counts = overlap.sum(-1)
    ids, counts = admission_lists(
        overlap.reshape(K * T, n_chunks), true_counts.reshape(K * T), ccap,
        hier=n_chunks > (HIER_ADMISSION_MIN_CHUNKS
                         if hier_min_chunks is None else hier_min_chunks),
        expand_bcap=expand_bcap,
    )
    assert n_chunks < (1 << 16), "chunk ids are packed as 16-bit pairs"
    # SMEM budget -> views per KERNEL dispatch. The packed per-tile chunk-id
    # lists live in ~1MB scalar memory, which capped whole-program batching
    # at K=8 on 512^2/tile-32/ccap-192 scans; instead the kernel alone is
    # split into view sub-batches while admission, decode and the cue stack
    # stay batched at the caller's K (batched convs fill the VPU far better).
    words = ((ccap + 1) // 2) + 2
    maxK = max_views_per_kernel or max(1, 900_000 // (T * words * 4))
    if ccap % 2:
        ids = jnp.pad(ids, ((0, 0), (0, 1)))
    pairs = ids.reshape(K * T, -1, 2)
    clist_rows = pairs[..., 0] | (pairs[..., 1] << 16)  # (K*T, words-2)

    origins, dirs = jax.vmap(lambda loc, R, fov: camera_rays(
        Camera(loc, R, fov, res)))(cameras.location, cameras.R, cameras.fov)
    tile_dirs = (
        dirs.reshape(K, n1d, tile, n1d, tile, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(K * T, P, 3)
    )
    dir_planes = (tile_dirs[..., 0], tile_dirs[..., 1], tile_dirs[..., 2])

    pack = scene_pack(mesh, (vertex_attrs,) if vertex_attrs is not None else ())
    pack = jnp.pad(pack, ((0, padF), (0, 0))).T  # (COLS, Fp; geom rows 0-9)

    # per-view per-face screen bboxes, u8-packed lo_tx|hi_tx|lo_by|hi_by
    # per int32: x at TILE granularity (the staging mask test), y at
    # 8-pixel-row BAND granularity — finer than the tile in y, so the
    # kernels both derive the tile mask AND per-pixel-block y-occupancy
    # flags that let the sweep skip staged chunks confined to the other
    # block (pallas_raster._band_mask_and_flags). One-pixel slack keeps the
    # quantized test a superset of the float pixel-space test; dead faces
    # quantize to lo=255 > hi=0 so they never stage.
    if compact:
        assert n1d <= 256 and res <= 2048, (
            f"compacting kernels pack tile indices ({n1d}/axis) and 8-px "
            f"y-bands ({res // 8}) as u8 (resolution {res} / tile {tile}): "
            "raise the tile size or pass compact=False"
        )
        lo_t = jnp.clip(jnp.floor((lo - 1.0) / tile), 0, 255).astype(jnp.int32)
        hi_t = jnp.clip(jnp.floor((hi + 1.0) / tile), 0, 255).astype(jnp.int32)
        lo_b = jnp.clip(jnp.floor((lo - 1.0) / 8.0), 0, 255).astype(jnp.int32)
        hi_b = jnp.clip(jnp.floor((hi + 1.0) / 8.0), 0, 255).astype(jnp.int32)
        bbox_words = (lo_t[..., 0] | (hi_t[..., 0] << 8)
                      | (lo_b[..., 1] << 16) | (hi_b[..., 1] << 24))
    outs = []
    for s in range(0, K, maxK):
        e = min(K, s + maxK)
        rows = slice(s * T, e * T)
        cl = clist_rows[rows].reshape(-1)
        cn = counts[rows]
        og = origins[s:e]
        dp = tuple(d[rows] for d in dir_planes)
        if streamed:
            outs.append(raster_tiles_pallas_streamed(
                cl, cn, og, pack, dp,
                chunk=chunk, interpret=interpret, tiles_per_view=T, ccap=ccap,
                bbox_words=bbox_words[s:e] if compact else None, n1d=n1d,
                stage_cap=stage_cap or STREAMED_STAGE_CAP,
            ))
        elif compact:
            outs.append(raster_tiles_pallas_compact(
                cl, cn, og, pack, bbox_words[s:e], dp,
                chunk=chunk, interpret=interpret, tiles_per_view=T, n1d=n1d,
                ccap=ccap, stage_cap=stage_cap or STAGE_CAP,
            ))
        else:
            outs.append(raster_tiles_pallas_chunklist(
                cl, cn, og, pack, dp,
                chunk=chunk, interpret=interpret, tiles_per_view=T, ccap=ccap,
            ))
    valid, t, u, v, f, attrs = (
        outs[0] if len(outs) == 1
        else tuple(jnp.concatenate([o[i] for o in outs]) for i in range(6))
    )
    uv = jnp.stack([u, v], -1)

    def untile(x):
        shp = x.shape[2:]
        return (
            x.reshape(K, n1d, n1d, tile, tile, *shp)
            .transpose(0, 1, 3, 2, 4, *range(5, 5 + len(shp)))
            .reshape(K, res, res, *shp)
        )

    t_img, f_img, uv_img, valid_img = untile(t), untile(f), untile(uv), untile(valid)
    forward = jnp.einsum("kij,j->ki", cameras.R, jnp.asarray([0.0, 0.0, -1.0]))
    cosang = jnp.einsum("khwc,kc->khw", dirs, forward, precision="highest")
    z_img = jnp.where(valid_img, t_img * cosang, _BIG)
    frag = Fragments(
        t=jnp.where(valid_img, t_img, _BIG),
        z=z_img, face=f_img, bary=uv_img, valid=valid_img,
    )
    if vertex_attrs is None:
        return frag
    return frag, untile(attrs)


@partial(jax.jit, static_argnames=("tile", "cap", "chunk", "interpret"))
def render_view_pallas(
    camera: Camera,
    mesh: TriangleMesh,
    tile: int = 64,
    cap: int = 1024,
    chunk: int = 128,
    interpret: bool = False,
    vertex_attrs: jax.Array | None = None,
):
    """render_view with the Pallas tile kernel (dynamic per-tile trip counts
    + in-kernel winner extraction; see pallas_raster.py). Identical Fragments
    to render_view.

    vertex_attrs: optional (V, C) per-vertex attributes interpolated for the
    winning triangle *inside the kernel* (replaces per-pixel gather-based
    shade.interpolate_vertex_attribute). Returns Fragments when None, else
    (Fragments, attr_img (H, W, C))."""
    batched = Camera(camera.location[None], camera.R[None],
                     jnp.asarray(camera.fov)[None], camera.resolution)
    out = render_views_fused(batched, mesh, tile, cap, chunk, interpret,
                             vertex_attrs)
    squeeze = lambda tree: jax.tree_util.tree_map(lambda a: a[0], tree)
    if vertex_attrs is None:
        return squeeze(out)
    frag, attrs = out
    return squeeze(frag), attrs[0]
