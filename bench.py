"""Benchmark: annotated viewpoints/sec on real TPU hardware.

Scene: a procedural Replica-like interior (room + furniture-scale boxes +
spheres, ~100k triangles) with baked curvature vertex colors. Per viewpoint,
the device pipeline (annotator.annotate_view) produces the 10 device-side
modalities at 512x512: depth_zbuffer, depth_euclidean, mask_valid, normal,
reshading, rgb, principal_curvature, edge_occlusion, edge_texture,
keypoints2d.

Baseline: the reference annotates its demo mesh (12 modalities, ~12 points,
one view each) in <= ~10 min on CPU (omnidata_annotator/README.md:55) ->
~0.02 viewpoints/sec with the full modality set. vs_baseline is measured
against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_VIEWPOINTS_PER_SEC = 12.0 / 600.0  # reference demo: ~12 viewpoints / 10 min


def build_scene(seed: int = 0, n_spheres: int = 4, n_boxes: int = 5):
    import jax.numpy as jnp

    from omnidata_tpu.cues.curvature import bake_curvature_colors
    from omnidata_tpu.mesh import from_arrays, room, cube, uv_sphere

    rng = np.random.RandomState(seed)
    parts = [room(size=10.0, height=3.2)]
    for _ in range(n_spheres):
        c = (rng.uniform(-3.5, 3.5), rng.uniform(-3.5, 3.5), rng.uniform(0.4, 1.2))
        parts.append(uv_sphere(radius=rng.uniform(0.25, 0.6), center=c, n_lat=48, n_lon=96))
    for _ in range(n_boxes):
        c = (rng.uniform(-4.0, 4.0), rng.uniform(-4.0, 4.0), rng.uniform(0.3, 1.0))
        parts.append(cube(size=rng.uniform(0.4, 1.2), center=c))

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
    from omnidata_tpu.mesh import split_long_edges

    colors = rng.rand(v.shape[0], 3).astype(np.float32) * 0.6 + 0.2
    v, f, colors, _, _, _ = split_long_edges(v, f, 0.8, vertex_colors=colors)
    mesh = from_arrays(v, f, vertex_colors=colors)
    curv = bake_curvature_colors(mesh, rings=1)
    return mesh, curv


def sample_cameras(n: int, seed: int = 1, resolution: int = 512):
    import jax
    import jax.numpy as jnp

    from omnidata_tpu.core import Camera, look_at_rotation

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
    Rs = jax.vmap(look_at_rotation)(jnp.asarray(locs), jnp.asarray(tgts))
    return [
        Camera(jnp.asarray(locs[i]), Rs[i], jnp.asarray(fovs[i]), resolution)
        for i in range(n)
    ]


def main():
    import jax
    import jax.numpy as jnp

    from omnidata_tpu.annotator import annotate_view, annotate_views
    from omnidata_tpu.core import Camera

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

    mesh, curv = build_scene()
    n_faces = mesh.num_faces
    cams = sample_cameras(n_views + K, resolution=res)

    def batch(idx):
        """Device-resident camera batch (built OUTSIDE the timed region —
        camera generation is point_info loading in the reference, not part
        of the render loop being measured)."""
        import numpy as _np

        return Camera(
            jnp.asarray(_np.stack([_np.asarray(cams[i].location) for i in idx])),
            jnp.asarray(_np.stack([_np.asarray(cams[i].R) for i in idx])),
            jnp.asarray(_np.stack([_np.asarray(cams[i].fov) for i in idx])),
            res,
        )

    kw = dict(tile=tile, cap=cap, chunk=chunk)
    batches = [
        jax.block_until_ready(batch(range(K + bi * K, K + (bi + 1) * K)))
        for bi in range(n_batches)
    ]

    # warmup / compile (fetch forces real completion: block_until_ready on
    # tunneled backends may only confirm enqueue)
    if on_tpu:
        out = annotate_views(batch(range(K)), mesh, curv, **kw)
    else:
        out = annotate_view(cams[0], mesh, curv, use_pallas=False, **kw)
    float(jnp.sum(out["depth_zbuffer"].astype(jnp.int32)))

    # accumulate a data-dependent scalar per batch so the final host fetch
    # provably waits for every view's full computation
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for bi in range(n_batches):
        if on_tpu:
            out = annotate_views(batches[bi], mesh, curv, **kw)
            acc = acc + jnp.sum(out["depth_zbuffer"].astype(jnp.int32))
        else:
            for i in range(K + bi * K, K + (bi + 1) * K):
                out = annotate_view(cams[i], mesh, curv, use_pallas=False, **kw)
                acc = acc + jnp.sum(out["depth_zbuffer"].astype(jnp.int32))
    _ = int(acc)  # host fetch: upper bound on all device work
    dt = time.perf_counter() - t0
    vps = n_views / dt

    result = {
        "metric": f"annotated viewpoints/sec (10 device modalities @512^2, {n_faces} tris, {backend})",
        "value": round(vps, 3),
        "unit": "viewpoints/s",
        "vs_baseline": round(vps / BASELINE_VIEWPOINTS_PER_SEC, 1),
    }

    if on_tpu and not os.environ.get("BENCH_FAST"):
        try:
            result["extra"] = bench_dpt_inference()
        except Exception as e:  # model bench must never cost the main metric
            result["extra"] = {"dpt_error": repr(e)[:200]}
    print(json.dumps(result))


def bench_dpt_inference(batch: int = 8, n_iters: int = 20):
    """DPT-hybrid-384 inference img/s/chip, f32 and bf16 (BASELINE.md target:
    >=3x A100 img/s/chip at matched accuracy; bf16 accuracy pinned by
    tests/test_models.py bf16 delta test). Chain-timed with a final scalar
    fetch (same forced-completion accounting as the annotator metric)."""
    import jax.numpy as jnp

    from omnidata_tpu.models.registry import dpt_hybrid_384

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 3, 384, 384), jnp.float32
    )
    out = {}
    for dt in ("float32", "bfloat16"):
        mb = dpt_hybrid_384(num_channels=1, dtype=dt)
        float(jnp.sum(mb.apply(mb.variables, x)))  # compile + warm
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_iters):
            acc = acc + jnp.sum(mb.apply(mb.variables, x))
        _ = float(acc)
        sec = time.perf_counter() - t0
        out[f"dpt384_{dt}_img_per_s"] = round(batch * n_iters / sec, 1)
    return out


if __name__ == "__main__":
    main()
