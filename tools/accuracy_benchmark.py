"""Offline train->eval accuracy benchmark — the framework's first recorded
accuracy evidence (VERDICT r4 #3).

The reference's quality contract is the OASIS table for its published
weights (docs/pretrained.html:96-106), but this machine has zero egress:
neither the published .ckpt bytes nor real OASIS/NYU data can be fetched.
The offline proxy this script implements end-to-end:

1. RENDER a multi-scene dataset with the own annotator (procedural rooms +
   furniture-scale spheres/boxes, Lambertian shading baked into vertex
   colors from two fixed directional lights — the rgb therefore carries
   the same normal cues a textured scan's baked lighting does, so
   rgb->normal is learnable);
2. TRAIN UNet-normals (reference config/normal.yml hyperparameters: loss =
   cos + 10*L1 over the dilated valid mask, Adam amsgrad lr 1e-4 wd 2e-6)
   and a DPT-depth run (config/depth.yml: MiDaS SSI stage of the loss
   schedule) on the train scenes;
3. EVAL on held-out scenes with the published metric suites
   (train/metrics.py: mean/median angular error, % within 11.25/22.5/30
   degrees, masked L1/MSE x100; depth: L1/MSE x100, log10, si-log, rel,
   irmse — paper_code/evaluation_metrics.py:13-110);
4. WRITE the numbers plus the untrained-baseline deltas to ACCURACY.md.

One command, idempotent per stage (cached scenes/renders/checkpoints are
reused):

    python tools/accuracy_benchmark.py            # full run (TPU, ~30-60 min)
    python tools/accuracy_benchmark.py --skip_depth --normal_steps 300  # quick
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _note(msg: str) -> None:
    print(f"[accuracy] {time.strftime('%H:%M:%S')} {msg}", flush=True)


def _vertex_normals_np(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (numpy: host prep must not touch jax —
    on the tunneled TPU backend a stray op costs a remote compile)."""
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def make_scene(path: str, seed: int, edge: float = 0.35) -> None:
    """Procedural interior with SHADED vertex colors.

    Albedo varies smoothly with position (per-scene random sinusoid
    palette); shading = ambient + two directional Lambertian terms on the
    vertex normals. Real scans (Replica/HM3D) carry baked lighting in
    their textures the same way — without it, random vertex colors give a
    normal-free rgb and the task is unlearnable by construction."""
    from omnidata_tpu.mesh import cube, room, uv_sphere, split_long_edges
    from omnidata_tpu.utils.convert_mesh import write_ply

    rng = np.random.RandomState(seed)
    parts = [room(size=float(rng.uniform(7.0, 10.0)), height=3.0)]
    for _ in range(rng.randint(3, 6)):
        c = (rng.uniform(-3.0, 3.0), rng.uniform(-3.0, 3.0), rng.uniform(0.4, 1.3))
        parts.append(uv_sphere(radius=rng.uniform(0.3, 0.7), center=c,
                               n_lat=32, n_lon=64))
    for _ in range(rng.randint(3, 7)):
        c = (rng.uniform(-3.2, 3.2), rng.uniform(-3.2, 3.2), rng.uniform(0.3, 1.0))
        parts.append(cube(size=rng.uniform(0.4, 1.3), center=c))
    vs, fs, off = [], [], 0
    for p in parts:
        vs.append(np.asarray(p.vertices))
        fs.append(np.asarray(p.faces[: p.num_faces]) + off)
        off += p.vertices.shape[0]
    v = np.concatenate(vs).astype(np.float32)
    f = np.concatenate(fs)
    v, f, _, _, _, _ = split_long_edges(v, f, edge)
    f = np.asarray(f)

    n = _vertex_normals_np(v, f)
    l1 = np.array([0.45, 0.35, 0.82], np.float32)
    l1 /= np.linalg.norm(l1)
    l2 = np.array([-0.6, -0.55, 0.35], np.float32)
    l2 /= np.linalg.norm(l2)
    shade = (0.25 + 0.55 * np.maximum(n @ l1, 0.0)
             + 0.25 * np.maximum(n @ l2, 0.0))
    freq = rng.uniform(0.5, 2.0, (3, 3)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
    albedo = 0.45 + 0.35 * np.sin(v @ freq.T + phase)  # (V,3) in [0.1,0.8]
    colors = np.clip(albedo * shade[:, None], 0.0, 1.0)
    write_ply(os.path.join(path, "mesh.ply"), v, f, vertex_colors=colors)


RENDER_TASKS = ("rgb", "normal", "depth_zbuffer", "mask_valid")


def annotate_scene(path: str, res: int, views_per_dispatch: int) -> None:
    """points + one fused device pass for all four training domains."""
    from omnidata_tpu.annotator.cli import run_device_tasks, run_points
    from omnidata_tpu.annotator.settings import load_settings

    settings = load_settings([
        f"RESOLUTION={res}",
        # tile 32 is the TPU bench configuration; smaller tiles at smoke
        # resolutions keep the XLA fallback path under its 8192-candidate
        # per-tile bound (raster.render_view)
        f"RASTER_TILE={min(32, max(16, res // 4))}",
        "NUM_POINTS=14",
        "MIN_CAMERA_SPACING=1.2",
        "MAX_VIEWS_PER_POINT=5",
        "MIN_VIEWS_PER_POINT=2",
        "MIN_NONFIXATED_AFTER_PRUNE=0",
        f"VIEWS_PER_DISPATCH={views_per_dispatch}",
    ])
    run_points(path, settings)
    run_device_tasks(path, list(RENDER_TASKS), settings)


def build_dataset(root: str, n_train: int, n_val: int, res: int,
                  views_per_dispatch: int, edge: float) -> tuple[str, str]:
    train_root = os.path.join(root, "train")
    val_root = os.path.join(root, "val")
    jobs = [(train_root, f"scene_{i:02d}", i) for i in range(n_train)]
    jobs += [(val_root, f"scene_{i:02d}", 100 + i) for i in range(n_val)]
    for parent, name, seed in jobs:
        d = os.path.join(parent, name)
        marker = os.path.join(d, ".annotated")
        if os.path.exists(marker):
            continue
        os.makedirs(d, exist_ok=True)
        _note(f"scene {name} (seed {seed}): build + annotate")
        make_scene(d, seed, edge)
        annotate_scene(d, res, views_per_dispatch)
        open(marker, "w").write("ok")
    return train_root, val_root


def _write_cfg(path: str, cfg: dict) -> str:
    import yaml

    with open(path, "w") as fh:
        yaml.safe_dump(cfg, fh)
    return path


def train_normal_model(root: str, train_root: str, val_root: str,
                       steps: int, res: int, batch: int) -> str:
    import train_normal

    ckpt_dir = os.path.join(root, "ckpt_normal")
    done = os.path.join(ckpt_dir, ".done")
    if os.path.exists(done):
        return ckpt_dir
    cfg = dict(
        model="unet", image_size=res, batch_size=batch, num_workers=4,
        lr=1.0e-4, weight_decay=2.0e-6, max_steps=steps,
        log_step=50, val_step=max(steps // 3, 1), ckpt_step=max(steps // 3, 1),
        save_top_k=2, checkpoint_dir=ckpt_dir,
        packed_cache=os.path.join(root, "packs"),
        data_paths={"replica": train_root},
        val_data_paths={"replica": val_root},
        train_datasets={"replica": True}, val_datasets={"replica": True},
    )
    _note(f"training UNet-normals: {steps} steps @ bs {batch} {res}^2")
    # --resume: restart-safe — a killed run continues from ckpt_dir/last
    # instead of paying the finished steps again (try_resume is a no-op on
    # a fresh directory)
    train_normal.main(["--config_file",
                       _write_cfg(os.path.join(root, "normal.yml"), cfg),
                       "--resume"])
    open(done, "w").write("ok")
    return ckpt_dir


def train_depth_model(root: str, train_root: str, val_root: str,
                      steps: int, batch: int) -> str:
    import train_depth

    ckpt_dir = os.path.join(root, "ckpt_depth")
    done = os.path.join(ckpt_dir, ".done")
    if os.path.exists(done):
        return ckpt_dir
    cfg = dict(
        model="dpt", image_size=384, batch_size=batch, num_workers=4,
        lr=1.0e-5, max_steps=steps,
        log_step=50, val_step=max(steps // 3, 1), ckpt_step=max(steps // 3, 1),
        save_top_k=2, checkpoint_dir=ckpt_dir,
        packed_cache=os.path.join(root, "packs"),
        data_paths={"replica": train_root},
        val_data_paths={"replica": val_root},
        train_datasets={"replica": True}, val_datasets={"replica": True},
    )
    _note(f"training DPT-depth: {steps} steps @ bs {batch} 384^2 "
          f"(SSI stage of the loss schedule)")
    train_depth.main(["--config_file",
                      _write_cfg(os.path.join(root, "depth.yml"), cfg),
                      "--resume"])
    open(done, "w").write("ok")
    return ckpt_dir


def _best_or_last(ckpt_dir: str) -> str:
    from omnidata_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    best = mgr.best()  # a checkpoint NAME (step_N), not a path
    return os.path.join(ckpt_dir, best) if best else os.path.join(ckpt_dir, "last")


def eval_normal_suite(val_root: str, res: int, checkpoint: str | None) -> dict:
    import eval_normal

    argv = ["--data_path", val_root, "--model", "unet",
            "--image_size", str(res)]
    if checkpoint:
        argv += ["--checkpoint", checkpoint]
    with contextlib.redirect_stdout(io.StringIO()):
        return eval_normal.main(argv)


def eval_depth_suite(val_root: str, checkpoint: str | None) -> dict:
    import eval_depth

    # --align ssi: the model is trained with the SSI stage of the MiDaS
    # loss (config/depth.yml schedule before step 15k), so the eval
    # protocol aligns pred to gt per image by least-squares scale/shift
    # before metrics (midas_loss.py:10-30) — the MiDaS convention;
    # unaligned absolute metrics are meaningless for an SSI-stage model
    argv = ["--data_path", val_root, "--image_size", "384", "--align", "ssi"]
    if checkpoint:
        argv += ["--checkpoint", checkpoint]
    with contextlib.redirect_stdout(io.StringIO()):
        return eval_depth.main(argv)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=os.path.join(REPO, "tmp", "accuracy"))
    p.add_argument("--train_scenes", type=int, default=10)
    p.add_argument("--val_scenes", type=int, default=2)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--normal_steps", type=int, default=1500)
    p.add_argument("--depth_steps", type=int, default=600)
    p.add_argument("--normal_batch", type=int, default=16)
    p.add_argument("--depth_batch", type=int, default=8)
    p.add_argument("--views_per_dispatch", type=int, default=32)
    p.add_argument("--edge", type=float, default=0.35,
                   help="long-edge split threshold (coarser for CPU smokes)")
    p.add_argument("--skip_depth", action="store_true")
    p.add_argument("--skip_normal", action="store_true",
                   help="depth-only rerun (ACCURACY.md then keeps no "
                        "normals table — merge by hand or run both)")
    p.add_argument("--out", default=os.path.join(REPO, "ACCURACY.md"))
    args = p.parse_args(argv)

    import jax

    cache = os.path.join(REPO, "tmp", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    os.makedirs(args.root, exist_ok=True)
    t0 = time.time()
    train_root, val_root = build_dataset(
        args.root, args.train_scenes, args.val_scenes, args.res,
        args.views_per_dispatch, args.edge)
    n_train = sum(len(os.listdir(os.path.join(train_root, s, "rgb")))
                  for s in os.listdir(train_root)
                  if os.path.isdir(os.path.join(train_root, s, "rgb")))
    n_val = sum(len(os.listdir(os.path.join(val_root, s, "rgb")))
                for s in os.listdir(val_root)
                if os.path.isdir(os.path.join(val_root, s, "rgb")))
    _note(f"dataset ready: {n_train} train / {n_val} val views "
          f"({time.time()-t0:.0f}s)")

    results: dict = {"n_train_views": n_train, "n_val_views": n_val,
                     "device": str(jax.devices()[0].device_kind)}

    if not args.skip_normal:
        _note("eval: untrained UNet baseline")
        results["normal_untrained"] = eval_normal_suite(
            val_root, args.res, None)
        ckpt_n = train_normal_model(
            args.root, train_root, val_root, args.normal_steps, args.res,
            args.normal_batch)
        _note("eval: trained UNet-normals")
        results["normal_trained"] = eval_normal_suite(
            val_root, args.res, _best_or_last(ckpt_n))
        results["normal_steps"] = args.normal_steps

    if not args.skip_depth:
        _note("eval: untrained DPT baseline")
        results["depth_untrained"] = eval_depth_suite(val_root, None)
        ckpt_d = train_depth_model(args.root, train_root, val_root,
                                   args.depth_steps, args.depth_batch)
        _note("eval: trained DPT-depth")
        results["depth_trained"] = eval_depth_suite(
            val_root, _best_or_last(ckpt_d))
        results["depth_steps"] = args.depth_steps

    write_report(args.out, args, results)
    print(json.dumps(results, indent=2, default=float))
    _note(f"done in {time.time()-t0:.0f}s -> {args.out}")
    return results


def write_report(path: str, args, r: dict) -> None:
    def row(d, keys):
        return " | ".join(f"{d[k]:.3f}" if isinstance(d.get(k), float)
                          else str(d.get(k, "—")) for k in keys)

    nk = sorted(r["normal_trained"]) if "normal_trained" in r else []
    lines = [
        "# ACCURACY — offline train->eval convergence benchmark",
        "",
        "First recorded accuracy evidence for this framework (VERDICT r4 #3).",
        "Zero egress blocks the published checkpoints and real OASIS/NYU data,",
        "so this is the offline proxy: render a dataset with the OWN annotator,",
        "train with the reference's hyperparameters, evaluate held-out scenes",
        "with the published metric suite (train/metrics.py; the same numbers",
        "the OASIS table reports for normals).",
        "",
        "Reproduce with ONE command (idempotent; deletes nothing):",
        "",
        "    python tools/accuracy_benchmark.py" +
        ("" if not args.skip_depth else " --skip_depth"),
        "",
        f"- dataset: {args.train_scenes} train / {args.val_scenes} held-out "
        f"procedural scenes, {r['n_train_views']} / {r['n_val_views']} views "
        f"at {args.res}^2 (rgb carries Lambertian shading baked into vertex "
        "colors — the learnable normal cue real scan textures carry)",
        f"- device: {r.get('device')}",
        "",
        "## Surface normals — UNet (config/normal.yml hyperparameters, "
        f"{r.get('normal_steps')} steps)",
        "",
        "| model | " + " | ".join(nk) + " |",
        "|---|" + "---|" * len(nk),
        "| untrained init | " + row(r.get("normal_untrained", {}), nk) + " |",
        "| trained | " + row(r.get("normal_trained", {}), nk) + " |",
        "",
        "(ang_* in degrees, lower better; pct_* higher better — the OASIS",
        "table's suite. The reference's published DPT v2 OASIS numbers are",
        "24.16 mean / 18.23 median on REAL OASIS imagery — not directly",
        "comparable to this synthetic-domain proxy; what this table proves",
        "is that the full annotator->loader->train->checkpoint->eval chain",
        "converges and is measured end-to-end.)",
    ]
    if "depth_trained" in r:
        dk = sorted(r["depth_trained"])
        lines += [
            "",
            "## Depth — DPT-hybrid (config/depth.yml hyperparameters, "
            f"{r.get('depth_steps')} steps, SSI stage; eval per-image "
            "scale/shift-aligned — the MiDaS protocol for SSI-stage models)",
            "",
            "| model | " + " | ".join(dk) + " |",
            "|---|" + "---|" * len(dk),
            "| untrained init | " + row(r.get("depth_untrained", {}), dk) + " |",
            "| trained | " + row(r.get("depth_trained", {}), dk) + " |",
        ]
    lines += [
        "",
        f"Recorded {time.strftime('%Y-%m-%d %H:%M')} by "
        "tools/accuracy_benchmark.py.",
        "",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
