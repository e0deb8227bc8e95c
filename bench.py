"""Benchmark: annotated viewpoints/sec on real TPU hardware.

Scenes: procedural Replica-like interiors (room + furniture-scale boxes +
spheres) with baked curvature vertex colors —
- small: 39,744 triangles (VMEM-resident chunk-list Pallas kernel)
- large: 584,704 triangles, real-scan scale (HBM-streamed Pallas kernel;
  extras.large_scene_*)

Per viewpoint, the device pipeline (annotator.annotate_views) produces the
10 device-side modalities at 512x512: depth_zbuffer, depth_euclidean,
mask_valid, normal, reshading, rgb, principal_curvature, edge_occlusion,
edge_texture, keypoints2d. extras.full13_vps adds the 3 host cues
(keypoints3d, segment_unsup2d, segment_unsup25d) computed on a worker pool
overlapped with the device batches — apples-to-apples with the reference's
full-modality demo timing.

Baseline: the reference annotates its demo mesh (12 modalities, ~12 points,
one view each) in <= ~10 min on CPU (omnidata_annotator/README.md:55) ->
~0.02 viewpoints/sec with the full modality set. The final line's
vs_baseline uses the honest comparator: full13_vps (all modalities incl.
host cues) when measured, else the device-modality rate.

Timeout-proofing (the round-3 run was killed by the driver's wall clock
with zero JSON emitted): the headline JSON line is printed+flushed the
moment the small-scene number exists; extras then run under a deadline
(BENCH_DEADLINE_S from process start, default 1200 s) and are skipped —
recorded in extra.skipped — once past it; the enriched line is printed
last so the driver parses whichever line survives. Scene assembly is
cached on disk (tmp/bench_scenes) and all host-side prep is numpy-only:
on the tunneled TPU backend any stray jax op costs a remote compile.

Prints JSON lines: {"metric", "value", "unit", "vs_baseline"[, "extra"]}.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

_T0 = time.perf_counter()
BASELINE_VIEWPOINTS_PER_SEC = 12.0 / 600.0  # reference demo: ~12 viewpoints / 10 min
# A100 anchor for DPT-hybrid-384 inference (BASELINE.md "DPT anchor"):
# measured 0.27 TFLOP/img (XLA cost analysis) / (312 TFLOP/s bf16 dense peak
# x ~12.5% MFU typical of the reference's torch-eager timm stack at batch 8)
# ~= 144 img/s. A perfectly-tuned A100 at our own measured MFU (~0.36)
# would be ~416 img/s; both bounds documented in BASELINE.md.
A100_DPT384_IMG_PER_S_EST = 144.0

_SCENE_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tmp", "bench_scenes"
)


def _deadline_s() -> float:
    return float(os.environ.get("BENCH_DEADLINE_S", 1200.0))


def _remaining() -> float:
    return _deadline_s() - (time.perf_counter() - _T0)


def _note(msg):
    """Progress marker on stderr (stdout carries only JSON lines); makes
    multi-minute compile stages diagnosable from the log."""
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)


def _look_at_np(loc: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Batched numpy twin of core.cameras.look_at_rotation (Blender TRACK_TO,
    track -Z up Y). Numpy on purpose: bench host prep must not trigger
    remote compiles through the TPU tunnel."""
    fwd = tgt - loc
    fwd /= np.maximum(np.linalg.norm(fwd, axis=-1, keepdims=True), 1e-30)
    z = -fwd
    up = np.array([0.0, 0.0, 1.0], np.float32)
    x = np.cross(np.broadcast_to(up, z.shape), z)
    xn = np.linalg.norm(x, axis=-1, keepdims=True)
    x = np.where(xn < 1e-8, np.array([1.0, 0.0, 0.0], np.float32), x / np.where(xn < 1e-8, 1.0, xn))
    y = np.cross(z, x)
    y /= np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return np.stack([x, y, z], -1).astype(np.float32)


def _assemble(parts, rng, edge: float):
    from omnidata_tpu.mesh import split_long_edges

    vs, fs = [], []
    off = 0
    for p in parts:
        vs.append(np.asarray(p.vertices))
        fs.append(np.asarray(p.faces[: p.num_faces]) + off)
        off += p.vertices.shape[0]
    v = np.concatenate(vs)
    f = np.concatenate(fs)
    # split the room's giant wall/floor faces: big faces overlap every tile
    # and poison chunk-granular binning (mesh.split_long_edges)
    colors = rng.rand(v.shape[0], 3).astype(np.float32) * 0.6 + 0.2
    v, f, colors, _, _, _ = split_long_edges(v, f, edge, vertex_colors=colors)
    return v, f, colors


def _cached_scene(name: str, build_arrays):
    """Disk-cached assembled scene: (mesh, curvature-colored mesh).

    build_arrays() -> (v, f, colors). The baked curvature colors are cached
    alongside so reruns skip both the edge split and the quadric fit; the
    cache key is just the scene name + a version tag (the builders are
    deterministic seeded generators)."""
    from omnidata_tpu.cues.curvature import bake_curvature_colors
    from omnidata_tpu.mesh import from_arrays

    os.makedirs(_SCENE_CACHE_DIR, exist_ok=True)
    path = os.path.join(_SCENE_CACHE_DIR, f"{name}_v1.npz")
    if os.path.exists(path):
        z = np.load(path)
        v, f, colors, curv_colors = z["v"], z["f"], z["colors"], z["curv"]
        mesh = from_arrays(v, f, vertex_colors=colors)
        return mesh, mesh._replace(vertex_colors=curv_colors)
    v, f, colors = build_arrays()
    mesh = from_arrays(v, f, vertex_colors=colors)
    curv = bake_curvature_colors(mesh, rings=1)
    np.savez(path, v=v, f=f, colors=colors,
             curv=np.asarray(curv.vertex_colors))
    return mesh, curv


def build_scene(seed: int = 0, n_spheres: int = 4, n_boxes: int = 5):
    """Small scene: 39,744 triangles."""
    from omnidata_tpu.mesh import cube, room, uv_sphere

    def arrays():
        rng = np.random.RandomState(seed)
        parts = [room(size=10.0, height=3.2)]
        for _ in range(n_spheres):
            c = (rng.uniform(-3.5, 3.5), rng.uniform(-3.5, 3.5), rng.uniform(0.4, 1.2))
            parts.append(uv_sphere(radius=rng.uniform(0.25, 0.6), center=c, n_lat=48, n_lon=96))
        for _ in range(n_boxes):
            c = (rng.uniform(-4.0, 4.0), rng.uniform(-4.0, 4.0), rng.uniform(0.3, 1.0))
            parts.append(cube(size=rng.uniform(0.4, 1.2), center=c))
        return _assemble(parts, rng, edge=0.8)

    return _cached_scene(f"small_{seed}_{n_spheres}_{n_boxes}", arrays)


def build_large_scene(seed: int = 0):
    """Replica-scan-scale scene: 584,704 triangles (BASELINE.md names real
    scans, ~10^5-10^6 faces — this exercises the HBM-streamed kernel path,
    cross-validated 400/400 against the brute raycaster)."""
    from omnidata_tpu.mesh import cube, room, uv_sphere

    def arrays():
        rng = np.random.RandomState(seed)
        parts = [room(size=10.0, height=3.2)]
        for _ in range(8):
            c = (rng.uniform(-3.5, 3.5), rng.uniform(-3.5, 3.5), rng.uniform(0.4, 1.2))
            parts.append(uv_sphere(radius=rng.uniform(0.25, 0.6), center=c,
                                   n_lat=96, n_lon=192))
        for _ in range(12):
            c = (rng.uniform(-4.0, 4.0), rng.uniform(-4.0, 4.0), rng.uniform(0.3, 1.0))
            parts.append(cube(size=rng.uniform(0.4, 1.2), center=c))
        return _assemble(parts, rng, edge=0.08)

    return _cached_scene(f"large_{seed}", arrays)


def sample_cameras_np(n: int, seed: int = 1):
    """(locations, rotations, fovs) as numpy — device-free host prep."""
    rng = np.random.RandomState(seed)
    locs = np.stack(
        [
            rng.uniform(-3.0, 3.0, n),
            rng.uniform(-3.0, 3.0, n),
            rng.uniform(1.2, 2.0, n),
        ],
        -1,
    ).astype(np.float32)
    tgts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(0.3, 2.5, n)], -1
    ).astype(np.float32)
    fovs = rng.uniform(0.7, 1.4, n).astype(np.float32)
    return locs, _look_at_np(locs, tgts), fovs


def _camera_batch(cams_np, idx, res):
    import jax.numpy as jnp

    from omnidata_tpu.core import Camera

    locs, Rs, fovs = cams_np
    idx = np.asarray(list(idx))
    return Camera(jnp.asarray(locs[idx]), jnp.asarray(Rs[idx]),
                  jnp.asarray(fovs[idx]), res)


def _enable_compile_cache():
    """Persistent XLA compile cache (tmp/xla_cache, shared with the test
    suite): the K=32 batched annotator program takes ~10 min of host XLA
    compile; cached reruns skip it."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tmp", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _ensure_live_backend(probe_timeout: int = 300) -> None:
    """The tunneled TPU backend can hang indefinitely at init (observed:
    multi-hour relay outages where even jax.devices() blocks). Probe it in
    a SUBPROCESS with a timeout before the parent imports jax; on failure,
    re-exec with the CPU backend so the bench reports an honest cpu number
    instead of hanging the driver forever."""
    # NOTE: cannot gate on `"jax" in sys.modules` — the device plugin's
    # sitecustomize pre-imports jax in every interpreter on this machine
    if os.environ.get("_BENCH_PROBED"):
        return
    os.environ["_BENCH_PROBED"] = "1"
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", probe_timeout))
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout, capture_output=True,
        )
        if r.returncode == 0:
            return
        _note(f"device probe failed (rc {r.returncode}); falling back to cpu")
    except subprocess.TimeoutExpired:
        _note(f"device probe hung > {probe_timeout}s; falling back to cpu")
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def main():
    _ensure_live_backend()
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from omnidata_tpu.annotator import annotate_view, annotate_views

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    res = 512
    tile = 32 if on_tpu else 64   # smaller tiles: fewer candidates/pixel-lane
    cap = 1024
    chunk = 128 if on_tpu else 64
    K = 32 if on_tpu else 2          # views per batched dispatch (SMEM-bound:
    # K * tiles * CHUNK_LIST_CAP/2 packed id words must fit the 1MB SMEM)
    n_batches = 16 if on_tpu else 1  # ~3 s timed region amortizes tunnel jitter
    n_views = K * n_batches

    _note("building small scene")
    mesh, curv = build_scene()
    n_faces = mesh.num_faces
    cams_np = sample_cameras_np(n_views + K)

    kw = dict(tile=tile, cap=cap, chunk=chunk)
    batches = [
        jax.block_until_ready(
            _camera_batch(cams_np, range(K + bi * K, K + (bi + 1) * K), res))
        for bi in range(n_batches)
    ]

    # warmup / compile (fetch forces real completion: block_until_ready on
    # tunneled backends may only confirm enqueue)
    _note(f"compiling small-scene annotate program ({backend})")
    if on_tpu:
        out = annotate_views(_camera_batch(cams_np, range(K), res), mesh, curv, **kw)
    else:
        from omnidata_tpu.core import Camera
        cam0 = Camera(jnp.asarray(cams_np[0][0]), jnp.asarray(cams_np[1][0]),
                      jnp.asarray(cams_np[2][0]), res)
        out = annotate_view(cam0, mesh, curv, use_pallas=False, **kw)
    float(jnp.sum(out["depth_zbuffer"].astype(jnp.int32)))

    # accumulate a data-dependent scalar per batch so the final host fetch
    # provably waits for every view's full computation
    def _timed_rep() -> float:
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for bi in range(n_batches):
            if on_tpu:
                out = annotate_views(batches[bi], mesh, curv, **kw)
                acc = acc + jnp.sum(out["depth_zbuffer"].astype(jnp.int32))
            else:
                from omnidata_tpu.core import Camera
                for i in range(K + bi * K, K + (bi + 1) * K):
                    cam = Camera(jnp.asarray(cams_np[0][i]),
                                 jnp.asarray(cams_np[1][i]),
                                 jnp.asarray(cams_np[2][i]), res)
                    out = annotate_view(cam, mesh, curv, use_pallas=False, **kw)
                    acc = acc + jnp.sum(out["depth_zbuffer"].astype(jnp.int32))
        _ = int(acc)  # host fetch: upper bound on all device work
        return n_views / (time.perf_counter() - t0)

    # >= 3 repetitions in the same session: the tunnel has documented ~2x
    # run-to-run variance, so a single sample makes round-over-round deltas
    # uninterpretable (VERDICT r4 Weak #5). value = median of the reps;
    # min/max + the kernel config ride along in the JSON.
    _note("timing small-scene batches (3 reps)")
    reps = [_timed_rep() for _ in range(3 if on_tpu else 1)]
    vps = float(np.median(reps))

    result = {
        "metric": f"annotated viewpoints/sec (10 device modalities @512^2, {n_faces} tris, {backend})",
        "value": round(vps, 3),
        "unit": "viewpoints/s",
        "vs_baseline": round(vps / BASELINE_VIEWPOINTS_PER_SEC, 1),
        "value_min": round(min(reps), 3),
        "value_max": round(max(reps), 3),
        "config": {"K": K, "tile": tile, "chunk": chunk,
                   "n_batches": n_batches, "reps": len(reps)},
    }
    # Flush the headline the moment it exists: if a later extra blows the
    # driver's wall clock, this line is already on stdout.
    print(json.dumps(result), flush=True)

    if on_tpu and not os.environ.get("BENCH_FAST"):
        extra = {}
        skipped = []
        # (name, fn, rough worst-case seconds incl. a cold remote compile)
        extras = [
            ("large_scene", bench_large_scene, 420.0),
            ("full13", lambda: bench_full13(mesh, curv, batches,
                                            cams_np, K, res, kw,
                                            device_vps=result["value"]),
             420.0),  # +180s: cold remote compile of the cue-map programs
            ("dpt", bench_dpt_inference, 300.0),
            ("xl_scene", lambda: bench_large_scene(
                build=build_xl_scene, prefix="xl"), 420.0),
        ]
        if os.environ.get("BENCH_TRAIN"):  # opt-in: one more slow compile
            extras.append(("train", bench_train_step, 600.0))
        for name, fn, est in extras:
            if _remaining() < est:
                _note(f"skipping extra {name}: {_remaining():.0f}s left < {est:.0f}s budget")
                skipped.append(name)
                continue
            try:
                _note(f"extra: {name}")
                extra.update(fn())
            except Exception as e:  # extras must never cost the main metric
                extra[f"{name}_error"] = repr(e)[:200]
        if skipped:
            extra["skipped"] = skipped
        extra["device10_vs_baseline"] = result["vs_baseline"]
        if "full13_vps" in extra:
            # honest comparator: all 13 modalities vs the reference's
            # 12-modality demo rate (VERDICT r3 #4)
            result["vs_baseline"] = round(
                extra["full13_vps"] / BASELINE_VIEWPOINTS_PER_SEC, 1)
        result["extra"] = extra
        print(json.dumps(result), flush=True)


def bench_large_scene(n_batches: int = 2, build=None, prefix: str = "large"):
    """Replica-scale throughput via the HBM-streamed kernel (the small
    scene's VMEM-resident kernel cannot hold a 584k-face pack). K=32: the
    SMEM chunk lists cap the KERNEL at 8 views, but render_views_fused
    sub-batches that internally, so admission/decode/cues batch 32-wide —
    measured 29 vps at K=8 vs 65 vps at K=32 (per-dispatch fixed work and
    small-grid underutilization amortize).

    prefix='xl' runs the same program shape on the >=1M-tri scene — real
    Replica scans are 1-6M faces, so the 584k point alone undershoots the
    north-star workload (VERDICT r4 #2)."""
    import jax
    import jax.numpy as jnp

    from omnidata_tpu.annotator import annotate_views

    _note(f"building {prefix} scene")
    mesh, curv = (build or build_large_scene)()
    K, tile, ccap, res = 32, 32, 192, 512
    cams_np = sample_cameras_np(K * (n_batches + 1), seed=3)
    batches = [
        jax.block_until_ready(_camera_batch(cams_np, range(K * b, K * (b + 1)), res))
        for b in range(n_batches + 1)
    ]
    kw = dict(tile=tile, cap=1024, chunk=128, ccap=ccap, streamed=True)
    _note("compiling large-scene streamed program")
    out = annotate_views(batches[0], mesh, curv, **kw)  # compile + warm
    float(jnp.sum(out["depth_zbuffer"].astype(jnp.int32)))

    def rep() -> float:
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for b in batches[1:]:
            out = annotate_views(b, mesh, curv, **kw)
            acc = acc + jnp.sum(out["depth_zbuffer"].astype(jnp.int32))
        _ = int(acc)
        return n_batches * K / (time.perf_counter() - t0)

    reps = [rep() for _ in range(3)]
    return {
        f"{prefix}_scene_tris": int(mesh.num_faces),
        f"{prefix}_scene_vps": round(float(np.median(reps)), 2),
        f"{prefix}_scene_vps_min": round(min(reps), 2),
        f"{prefix}_scene_vps_max": round(max(reps), 2),
    }


def build_xl_scene(seed: int = 0):
    """>=1M-triangle scene, matching real Replica scan sizes (1-6M faces)."""
    from omnidata_tpu.mesh import cube, room, uv_sphere

    def arrays():
        rng = np.random.RandomState(seed)
        parts = [room(size=10.0, height=3.2)]
        for _ in range(10):
            c = (rng.uniform(-3.5, 3.5), rng.uniform(-3.5, 3.5),
                 rng.uniform(0.4, 1.2))
            parts.append(uv_sphere(radius=rng.uniform(0.25, 0.6), center=c,
                                   n_lat=128, n_lon=256))
        for _ in range(12):
            c = (rng.uniform(-4.0, 4.0), rng.uniform(-4.0, 4.0),
                 rng.uniform(0.3, 1.0))
            parts.append(cube(size=rng.uniform(0.4, 1.2), center=c))
        return _assemble(parts, rng, edge=0.055)

    return _cached_scene(f"xl_{seed}", arrays)


def bench_full13(mesh, curv, batches, cams_np, K, res, kw, device_vps=None,
                 n_batches: int = 3):
    """Full 13-modality rate: the 10 device modalities + the 3 host cues
    (keypoints3d / segment_unsup2d / segment_unsup25d) computed on a worker
    pool from the in-flight device outputs — the same overlap the CLI's
    `--task all` uses; apples-to-apples with the reference's 12-modality
    demo timing (omnidata_annotator/README.md:55).

    Pipelined over n_batches like the CLI's steady state: every batch's
    device program is dispatched up front (async) and a dedicated fetch
    THREAD device_gets them in order, so the tunnel transfer of batch b+1
    overlaps both the pool's cue work and the main thread's submit of
    batch b (socket IO releases the GIL — on a 1-core host the cue workers
    timeslice with it instead of queueing behind it). Only the FIRST
    batch's fetch is inherently serial; n_batches=3 amortizes it. Reuses
    the headline's already-compiled K-view program; the cue-prefix map
    programs (NARF borders + seg blur/channel maps) are warmed with one
    untimed pass first. The host cues are CPU-bound, so on this 1-core box
    the rate is host-pinned; full13_host_cpus records the denominator."""
    import jax
    import jax.numpy as jnp

    from omnidata_tpu.annotator import annotate_views
    from omnidata_tpu.cues import narf_device as nd

    # batches[bi] renders cams_np indices [K+bi*K, K+(bi+1)*K) (see main's
    # batch construction — index 0..K-1 is the warmup batch)
    fov_of = lambda bi, vi: float(cams_np[2][K + bi * K + vi])

    # same spawn'd CPU-pinned pool the CLI's --task all path uses (single
    # source of truth for the accelerator-gate handling)
    from omnidata_tpu.annotator.cli import _make_host_cue_pool

    pool = _make_host_cue_pool()

    needed = ("depth_zbuffer", "rgb")
    n_lvl = nd.max_levels_for(res, res)

    # device cue prefixes on the same dispatch: NARF border maps (the
    # convolution-shaped 74% of keypoints3d's host cost,
    # cues/narf_device.py) + the segmentation blur/channel maps
    # (cues/seg_device.py) — only the sequential cores (region growing,
    # Kruskal, ncut) ride the host pool
    from omnidata_tpu.cues import seg_device as sd

    def device_pass(bi):
        out = annotate_views(batches[bi], mesh, curv, **kw)
        depth_m = out["depth_zbuffer"].astype(jnp.float32) * (128.0 / 65535.0)
        focal_dev = res / (2.0 * jnp.tan(batches[bi].fov / 2.0))
        bmaps = nd.narf_border_maps(depth_m, focal_dev, n_lvl, 128.0)
        seg2d_q = sd.seg2d_blur_maps(out["rgb"], sigma=3.0)
        seg25d_q = sd.seg25d_channel_maps(
            out["depth_zbuffer"], out["normal"], out["edge_occlusion"])
        # normal/edge_occlusion are NOT fetched: segment_25d reads only the
        # device channel maps (input_img), so the tunnel carries depth (for
        # the kp3d interest stage) + rgb (for the seg2d RAG) + the maps
        return {t: out[t] for t in needed}, bmaps, seg2d_q, seg25d_q

    # warm/compile the map programs OUTSIDE the timer (the annotate program
    # is already warm from the headline): full13_vps measures throughput,
    # not the two remote compiles
    jax.device_get(device_pass(0))

    def submit(bi, fetched, futures):
        out_np, bmaps_np, seg2d_np, seg25d_np = fetched
        for vi in range(K):
            fov = fov_of(bi, vi)
            f_px = res / (2.0 * math.tan(fov / 2.0))
            S = min(n_lvl, nd.n_levels_for(f_px, res, res))
            vmaps = [(lvl[0][vi], lvl[1][vi], lvl[2][vi])
                     for lvl in bmaps_np[:S]]
            futures.append(pool.submit(
                _host_cues, {t: out_np[t][vi] for t in needed}, fov,
                res, vmaps, seg2d_np[vi], seg25d_np[vi]))

    from concurrent.futures import ThreadPoolExecutor

    n_batches = min(n_batches, len(batches))
    t0 = time.perf_counter()
    futures = []
    # 2 fetch streams: the tunnel's per-connection bandwidth is the
    # pipeline's bound on this box (measured 10-35 MB/s across sessions for
    # the ~243 MB/batch cue payload); two concurrent device_gets measured
    # 1.34x the single-stream rate
    with pool, ThreadPoolExecutor(2) as fetcher:
        devs = [device_pass(bi) for bi in range(n_batches)]  # async dispatch
        fetches = [fetcher.submit(jax.device_get, d) for d in devs]
        for bi, ff in enumerate(fetches):
            submit(bi, ff.result(), futures)
        cue_secs = [f.result() for f in futures]
    dt = time.perf_counter() - t0
    K_total = n_batches * K
    # Per-cue host cost for the v5e-8 scaling model committed in
    # BASELINE.md "full13 scaling model": device side scales with 8 chips,
    # host cues scale with the VM's cores (ct5lp-hightpu-8t ships 224
    # vCPUs; 208 assumed usable for cue work). Measured on a QUIET host
    # (3 views re-run after the timed region, nothing else on the box):
    # the in-pipeline medians inflate 1.5-2x from timeslicing against the
    # fetch thread + the second worker on this 1-core box — contention a
    # 224-core pod host does not have, so using them would understate the
    # modeled rate. The pipelined medians still ride along for honesty.
    d0 = device_pass(0)
    # force device completion BEFORE timing the fetch (axon
    # block_until_ready only confirms enqueue): fetch a dependent scalar
    float(jnp.sum(d0[0]["depth_zbuffer"].astype(jnp.int32)))
    tf0 = time.perf_counter()
    f = jax.device_get(d0)
    fetch_s = time.perf_counter() - tf0
    payload_mb = sum(a.nbytes for a in jax.tree_util.tree_leaves(f)) / 1e6
    quiet = []
    for vi in range(3):
        out_np, bmaps_np, seg2d_np, seg25d_np = f
        fov = fov_of(0, vi)
        f_px = res / (2.0 * math.tan(fov / 2.0))
        S = min(n_lvl, nd.n_levels_for(f_px, res, res))
        vmaps = [(lvl[0][vi], lvl[1][vi], lvl[2][vi])
                 for lvl in bmaps_np[:S]]
        quiet.append(_host_cues({t: out_np[t][vi] for t in needed}, fov,
                                res, vmaps, seg2d_np[vi], seg25d_np[vi]))
    med = {k: float(np.median([c[k] for c in quiet])) for k in quiet[0]}
    med_pipelined = {k: float(np.median([c[k] for c in cue_secs]))
                     for k in cue_secs[0]}
    host_s = sum(med.values())
    modeled = 208.0 / host_s
    if device_vps:  # capped by 8 chips of the measured device-only rate
        modeled = min(modeled, 8.0 * float(device_vps))
    return {"full13_vps": round(K_total / dt, 2),
            "full13_host_cpus": os.cpu_count() or 1,
            "full13_cue_secs": {k: round(v, 3) for k, v in med.items()},
            "full13_cue_secs_pipelined": {k: round(v, 3)
                                          for k, v in med_pipelined.items()},
            # tunnel weather report: the cue payload is ~7.6 MB/view and
            # the tunnel swings 10-35 MB/s session-to-session, so the
            # measured full13 rate is fetch-bound below ~20 MB/s — this
            # makes round-over-round full13 deltas interpretable
            "full13_fetch_mbps": round(payload_mb / fetch_s, 1),
            "full13_payload_mb_per_view": round(payload_mb / K, 2),
            "full13_modeled_v5e8_vps": round(modeled, 1)}


def _host_cues(arrs, fov, res, border_maps=None, seg2d_q=None,
               seg25d_q=None):
    """The 3 host-side cues for one view (module-level: picklable for the
    full13 process pool). Returns per-cue wall seconds for the scaling
    model. seg2d_q / seg25d_q: device-computed quantized input maps
    (cues/seg_device.py) — the segmentation cues then skip their host
    gaussians."""
    from omnidata_tpu.cues.keypoints3d import keypoints3d_from_depth_code
    from omnidata_tpu.cues.segmentation import segment_2d, segment_25d

    t0 = time.perf_counter()
    keypoints3d_from_depth_code(
        arrs["depth_zbuffer"], fov, res, support_size=0.3, max_meters=128.0,
        border_maps=border_maps,
    )
    t1 = time.perf_counter()
    blurred = None
    if seg2d_q is not None:
        from omnidata_tpu.cues.seg_device import seg2d_blurred_from_maps

        blurred = seg2d_blurred_from_maps(seg2d_q)
    segment_2d(arrs["rgb"], scale=500.0, blur=3.0, cut_thresh=0.005,
               self_edge_weight=2.0, blurred255=blurred)
    t2 = time.perf_counter()
    input_img = None
    if seg25d_q is not None:
        from omnidata_tpu.cues.seg_device import seg25d_input_from_maps

        input_img = seg25d_input_from_maps(seg25d_q, 2.0, 1.0, 10.0)
    segment_25d(arrs.get("depth_zbuffer"), arrs.get("normal"),
                arrs.get("edge_occlusion"), input_img=input_img)
    return {"kp3d": t1 - t0, "seg2d": t2 - t1,
            "seg25d": time.perf_counter() - t2}


def bench_train_step(batch: int = 8, n_iters: int = 10):
    """Depth training step throughput (DPT-384 fwd+bwd + MiDaS/VNL losses +
    Adam, in-step augmentation on) — the reference trains this config at
    bs 8 @384 on V100s (config/depth.yml). Opt-in via BENCH_TRAIN=1."""
    import jax
    import jax.numpy as jnp

    from omnidata_tpu.models.dpt import DPTHybrid
    from omnidata_tpu.train.depth import VNLParams, make_depth_train_step
    from omnidata_tpu.train.state import create_train_state, depth_optimizer

    size = 384
    model = DPTHybrid(num_channels=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    state = create_train_state(variables, depth_optimizer(lr=1e-5))

    def apply_fn(v, rgb_nchw):
        return model.apply(v, jnp.transpose(rgb_nchw, (0, 2, 3, 1)))[..., 0]

    step_fn = jax.jit(
        make_depth_train_step(apply_fn, VNLParams(1.0, 1.0, (size, size)),
                              augment=True, image_size=size),
        donate_argnums=0,
    )
    rng = np.random.RandomState(0)
    batch_data = {
        "rgb": jnp.asarray(rng.rand(batch, 3, size, size), jnp.float32),
        "depth": jnp.asarray(rng.rand(batch, 1, size, size), jnp.float32),
        "mask_valid": jnp.asarray(rng.rand(batch, 1, size, size) > 0.1),
    }
    key = jax.random.PRNGKey(1)
    state, m = step_fn(state, batch_data, key)  # compile + warm
    float(jax.tree_util.tree_leaves(m)[0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, m = step_fn(state, batch_data, jax.random.fold_in(key, i))
    _ = float(jax.tree_util.tree_leaves(m)[0])  # forces the whole chain
    sec = time.perf_counter() - t0
    return {
        "train_depth_img_per_s": round(batch * n_iters / sec, 1),
        "train_depth_ms_per_step": round(sec / n_iters * 1000, 1),
    }


def bench_dpt_inference(batch: int = 8, n_iters: int = 20):
    """DPT-hybrid-384 inference img/s/chip, f32 and bf16 (BASELINE.md target:
    >=3x A100 img/s/chip at matched accuracy; bf16 accuracy pinned by
    tests/test_models.py bf16 delta test). Chain-timed with a final scalar
    fetch (same forced-completion accounting as the annotator metric).

    Why bf16 lands under 2x f32 (measured 1.83x, MFU 0.355 bf16 / 0.386
    f32 on v5e): only the MXU matmul/conv FLOPs double with bf16. The
    hybrid's fixed-rate work — GroupNorm stats over 384^2 stem maps,
    LayerNorm/softmax f32 islands (mixed-precision practice), align-corners
    bilinear resizes in all four refinenets, and the 2x-upsampled 384->768
    head convs' memory traffic — runs on the VPU/HBM at the same speed in
    either dtype, so Amdahl caps the end-to-end ratio near 1.8-1.9x at
    batch 8. dpt384_vs_a100_est reports the ratio against the documented
    A100 anchor (BASELINE.md: ~144 img/s, torch-eager-stack estimate)."""
    import jax.numpy as jnp

    from omnidata_tpu.models.registry import dpt_hybrid_384

    import jax

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 3, 384, 384), jnp.float32
    )
    # MXU peak per chip by device kind (bf16 TFLOP/s; f32 is half rate on MXU)
    peaks = {"v5e": 197.0, "v5lite": 197.0, "v5p": 459.0, "v4": 275.0,
             "v6e": 918.0, "v6": 918.0}
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    peak_bf16 = next((v for k, v in peaks.items() if k in kind), None)
    out = {"dpt384_device_kind": jax.devices()[0].device_kind}
    for dt in ("float32", "bfloat16"):
        mb = dpt_hybrid_384(num_channels=1, dtype=dt)
        fwd = jax.jit(lambda v, xx: mb.apply(v, xx))
        try:
            cost = fwd.lower(mb.variables, x).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            flops = None
        float(jnp.sum(fwd(mb.variables, x)))  # compile + warm
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_iters):
            acc = acc + jnp.sum(fwd(mb.variables, x))
        _ = float(acc)
        sec = time.perf_counter() - t0
        ips = batch * n_iters / sec
        out[f"dpt384_{dt}_img_per_s"] = round(ips, 1)
        if flops:
            tflops = flops * n_iters / sec / 1e12
            out[f"dpt384_{dt}_tflops"] = round(tflops, 1)
            peak = peak_bf16 if peak_bf16 is None or dt == "bfloat16" \
                else peak_bf16 / 2.0
            if peak:
                out[f"dpt384_{dt}_mfu"] = round(tflops / peak, 3)
    # bf16 batch sweep (VERDICT r4 #4): larger batches amortize the fixed
    # per-dispatch work; each size costs one more remote compile, so gate
    # on remaining deadline. mb/fwd still hold the bfloat16 build from the
    # loop above (last dtype) — reuse it: a fresh init would re-ship ~250MB
    # of weights through the tunnel.
    assert dt == "bfloat16", dt  # loop ordering guarantees the bf16 build
    for b in (16, 32):
        if _remaining() < 180.0:
            break
        xb = jnp.asarray(
            np.random.RandomState(0).rand(b, 3, 384, 384), jnp.float32)
        try:
            float(jnp.sum(fwd(mb.variables, xb)))  # compile + warm
            t0 = time.perf_counter()
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n_iters):
                acc = acc + jnp.sum(fwd(mb.variables, xb))
            _ = float(acc)
            out[f"dpt384_bf16_b{b}_img_per_s"] = round(
                b * n_iters / (time.perf_counter() - t0), 1)
        except Exception as e:
            out[f"dpt384_bf16_b{b}_error"] = repr(e)[:120]
            break
    best = max(out.get("dpt384_bfloat16_img_per_s", 0.0),
               out.get("dpt384_bf16_b16_img_per_s", 0.0),
               out.get("dpt384_bf16_b32_img_per_s", 0.0))
    if best:
        out["dpt384_vs_a100_est"] = round(best / A100_DPT384_IMG_PER_S_EST, 2)
    return out


if __name__ == "__main__":
    main()
