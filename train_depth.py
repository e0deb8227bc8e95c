"""train_depth.py — DPT-hybrid monocular depth training
(reference: omnidata_tools/torch/train_depth.py + config/depth.yml).

    python train_depth.py --config_file config/depth.yml [--max_steps N]

Loss: MiDaS SSI-MAE (+ 0.1 gradient matching + 10 VNL after 15k steps);
Adam lr 1e-5, grad-clip 10; rgb normalized to [-1,1]; fixed 384 resize;
data-parallel over all local devices (+ optional 'model' axis), Orbax
checkpoints with save_top_k on the validation loss.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="config/depth.yml")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    args = p.parse_args(argv)
    cfg = yaml.safe_load(open(args.config_file))
    _known = {"augment", "batch_size", "checkpoint_dir", "ckpt_step", "data_parallel", "data_paths", "image_size", "log_step", "lr", "max_steps", "model_parallel", "save_top_k", "val_data_paths", "val_fraction"}
    unknown = sorted(set(cfg) - _known)
    if unknown:
        print(f"[config] WARNING: ignoring unknown keys {unknown} "
              f"(known: {sorted(_known)})")

    import jax
    import jax.numpy as jnp

    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.losses import VNLParams
    from omnidata_tpu.models import DPTHybrid
    from omnidata_tpu.train import (
        batch_sharding,
        local_batch_to_global,
        create_train_state,
        depth_optimizer,
        make_depth_eval_step,
        make_depth_train_step,
        make_mesh,
        param_sharding,
        replicated,
    )
    from omnidata_tpu.train.checkpoints import CheckpointManager
    from omnidata_tpu.train.loop import dump_val_images, run_validation, split_train_val

    image_size = int(cfg.get("image_size", 384))
    batch_size = int(cfg.get("batch_size", 8))
    lr = float(cfg.get("lr", 1e-5))
    max_steps = args.max_steps or int(cfg.get("max_steps", 100000))
    ckpt_dir = args.checkpoint_dir or cfg.get("checkpoint_dir", "./checkpoints/depth")

    # datasets: one per configured component, equal sampling
    datasets = []
    for comp, path in (cfg.get("data_paths") or {}).items():
        if not path or not os.path.isdir(path):
            continue
        datasets.append(
            OmnidataDataset(
                Options(
                    data_path=path,
                    tasks=("rgb", "depth_zbuffer", "mask_valid"),
                    image_size=image_size,
                    random_flip=True,
                )
            )
        )
    if not datasets:
        raise SystemExit("no data_paths configured / found in config")

    # validation: explicit val_data_paths, else holdout split per component
    # (reference monitors val_depth_loss, train_depth.py ModelCheckpoint)
    val_datasets = []
    for comp, path in (cfg.get("val_data_paths") or {}).items():
        if path and os.path.isdir(path):
            val_datasets.append(
                OmnidataDataset(
                    Options(data_path=path,
                            tasks=("rgb", "depth_zbuffer", "mask_valid"),
                            image_size=image_size, random_flip=False)
                )
            )
    if not val_datasets:
        datasets, val_datasets = split_train_val(
            datasets, float(cfg.get("val_fraction", 0.05))
        )

    n_model = int(cfg.get("model_parallel", 1))
    n_data = cfg.get("data_parallel")  # None = all remaining devices
    mesh = make_mesh(n_data=int(n_data) if n_data else None, n_model=n_model)
    model = DPTHybrid(num_channels=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )
    variables = jax.device_put(variables, param_sharding(variables, mesh))
    state = create_train_state(variables, depth_optimizer(lr=lr))

    def apply_fn(v, rgb_nchw):
        return model.apply(v, jnp.transpose(rgb_nchw, (0, 2, 3, 1)))[..., 0]

    vnl_params = VNLParams(1.0, 1.0, (image_size, image_size))
    augment = bool(cfg.get("augment", True))  # reference always augments train
    step_fn = jax.jit(
        make_depth_train_step(apply_fn, vnl_params, augment=augment,
                              image_size=image_size),
        donate_argnums=0,
    )
    eval_fn = jax.jit(make_depth_eval_step(apply_fn, vnl_params))

    ckpt = CheckpointManager(ckpt_dir, save_top_k=int(cfg.get("save_top_k", 3)))
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b_shard = batch_sharding(mesh)

    def prepare(batch, train: bool):
        rgb = batch["rgb"].astype(np.float32)
        if not (train and augment):
            rgb = rgb * 2.0 - 1.0  # [-1,1]; aug path normalizes in-step
        b = {
            "rgb": rgb,
            "depth": batch["depth_zbuffer"].astype(np.float32),
            "mask_valid": batch["mask_valid"] > 0.5,
        }
        if jax.process_count() > 1:
            # multi-host: each process contributes its local stripe of the
            # global batch (omnidata_tpu.train.multihost)
            return local_batch_to_global(mesh, b)
        return jax.device_put(b, {k: b_shard for k in b})

    def validate(step):
        nonlocal key
        key, k = jax.random.split(key)
        val_loss, sample = run_validation(
            val_datasets, batch_size, lambda nb: prepare(nb, train=False),
            lambda b: eval_fn(state.params, b, k), "val_depth_loss",
        )
        if val_loss is None:
            return None
        print(f"step {step}: val_depth_loss {val_loss:.4f}")
        dump_val_images(ckpt_dir, step, sample)
        ckpt.save(jax.device_get(state.params), step, metric=val_loss)
        return val_loss

    step = 0
    t0 = time.time()
    with mesh:
        while step < max_steps:
            ds = datasets[rng.randint(len(datasets))]
            for batch in ds.batches(batch_size):
                b = prepare(batch, train=True)
                key, k = jax.random.split(key)
                try:
                    state, metrics = step_fn(state, b, k)
                except Exception as e:  # crash dump (train_*.py:341-348)
                    from omnidata_tpu.train import save_crash_dump

                    d = save_crash_dump(ckpt_dir, state.params, b, e)
                    print(f"saved crash dump to {d}")
                    raise
                step += 1
                if step % int(cfg.get("log_step", 100)) == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    print(f"step {step}: {m} ({(time.time()-t0)/step:.2f}s/step)")
                    validate(step)
                if step % int(cfg.get("ckpt_step", 1000)) == 0:
                    ckpt.save(jax.device_get(state.params), step, metric=None)
                if step >= max_steps:
                    break
    ckpt.save(jax.device_get(state.params), step, metric=None)
    print(f"done: {step} steps in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
