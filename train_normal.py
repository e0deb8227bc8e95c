"""train_normal.py — surface-normal training (reference:
omnidata_tools/torch/train_normal.py + config/normal.yml).

    python train_normal.py --config_file config/normal.yml [--max_steps N]

Model: UNet (v1) or DPT-hybrid (model: dpt); loss = cosine-angular + 10*L1
over the dilated valid mask; Adam amsgrad lr 1e-4 wd 2e-6, grad-clip 10.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="config/normal.yml")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    args = p.parse_args(argv)
    cfg = yaml.safe_load(open(args.config_file))
    _known = {"augment", "batch_size", "checkpoint_dir", "ckpt_step", "data_parallel", "data_paths", "image_size", "log_step", "lr", "max_steps", "model", "model_parallel", "save_top_k", "unet_downsample", "val_data_paths", "val_fraction", "weight_decay"}
    unknown = sorted(set(cfg) - _known)
    if unknown:
        print(f"[config] WARNING: ignoring unknown keys {unknown} "
              f"(known: {sorted(_known)})")

    import jax
    import jax.numpy as jnp

    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.models import DPTHybrid, UNet
    from omnidata_tpu.train import (
        batch_sharding,
        local_batch_to_global,
        create_train_state,
        make_mesh,
        make_normal_eval_step,
        make_normal_train_step,
        normal_optimizer,
        param_sharding,
    )
    from omnidata_tpu.train.checkpoints import CheckpointManager
    from omnidata_tpu.train.loop import dump_val_images, run_validation, split_train_val

    image_size = int(cfg.get("image_size", 512))
    batch_size = int(cfg.get("batch_size", 16))
    lr = float(cfg.get("lr", 1e-4))
    wd = float(cfg.get("weight_decay", 2e-6))
    max_steps = args.max_steps or int(cfg.get("max_steps", 100000))
    ckpt_dir = args.checkpoint_dir or cfg.get("checkpoint_dir", "./checkpoints/normal")

    datasets = []
    for comp, path in (cfg.get("data_paths") or {}).items():
        if not path or not os.path.isdir(path):
            continue
        datasets.append(
            OmnidataDataset(
                Options(
                    data_path=path,
                    tasks=("rgb", "normal", "mask_valid"),
                    image_size=image_size,
                    random_flip=True,
                )
            )
        )
    if not datasets:
        raise SystemExit("no data_paths configured / found in config")

    # validation split (reference monitors val_normal_loss)
    val_datasets = []
    for comp, path in (cfg.get("val_data_paths") or {}).items():
        if path and os.path.isdir(path):
            val_datasets.append(
                OmnidataDataset(
                    Options(data_path=path, tasks=("rgb", "normal", "mask_valid"),
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
    if cfg.get("model", "unet") == "dpt":
        model = DPTHybrid(num_channels=3)
    else:
        model = UNet(out_channels=3,
                     downsample=int(cfg.get("unet_downsample", 6)))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )
    variables = jax.device_put(variables, param_sharding(variables, mesh))
    state = create_train_state(variables, normal_optimizer(lr=lr, weight_decay=wd))

    def apply_fn(v, rgb_nchw):
        y = model.apply(v, jnp.transpose(rgb_nchw, (0, 2, 3, 1)))
        return jnp.transpose(y, (0, 3, 1, 2))

    augment = bool(cfg.get("augment", True))  # reference augments train rgb
    step_fn = jax.jit(make_normal_train_step(apply_fn, augment=augment),
                      donate_argnums=0)
    eval_fn = jax.jit(make_normal_eval_step(apply_fn))
    ckpt = CheckpointManager(ckpt_dir, save_top_k=int(cfg.get("save_top_k", 3)))
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    b_shard = batch_sharding(mesh)

    def prepare(batch):
        b = {
            "rgb": batch["rgb"].astype(np.float32),
            "normal": batch["normal"].astype(np.float32),
            "mask_valid": batch["mask_valid"] > 0.5,
        }
        if jax.process_count() > 1:
            # multi-host: each process contributes its local stripe of the
            # global batch (omnidata_tpu.train.multihost)
            return local_batch_to_global(mesh, b)
        return jax.device_put(b, {k: b_shard for k in b})

    def validate(step):
        val_loss, sample = run_validation(
            val_datasets, batch_size, prepare,
            lambda b: eval_fn(state.params, b), "val_normal_loss",
        )
        if val_loss is None:
            return None
        print(f"step {step}: val_normal_loss {val_loss:.4f}")
        dump_val_images(ckpt_dir, step, sample)
        ckpt.save(jax.device_get(state.params), step, metric=val_loss)
        return val_loss

    step = 0
    t0 = time.time()
    with mesh:
        while step < max_steps:
            ds = datasets[rng.randint(len(datasets))]
            for batch in ds.batches(batch_size):
                b = prepare(batch)
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
