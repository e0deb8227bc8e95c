"""train_normal.py — surface-normal training (reference:
omnidata_tools/torch/train_normal.py + config/normal.yml).

    python train_normal.py --config_file config/normal.yml [--max_steps N]
        [--resume] [--pretrained ckpt]

Model: UNet (v1) or DPT-hybrid (model: dpt); loss = cosine-angular + 10*L1
over the dilated valid mask; Adam amsgrad lr 1e-4 wd 2e-6, grad-clip 10;
batches mix components 1/k with a threaded prefetch pool (reference
WeightedRandomSampler + DataLoader(num_workers=16), train_normal.py:140-156).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np
import yaml

KNOWN_KEYS = {
    "augment", "batch_size", "cache_dir", "checkpoint_dir", "ckpt_step",
    "data_parallel", "data_paths", "image_size", "log_step", "lr",
    "max_steps", "model", "model_parallel", "num_workers", "packed_cache",
    "pretrained",
    "pretrained_weights_path", "save_top_k", "taskonomy_variant",
    "train_datasets", "unet_downsample", "val_data_paths", "val_datasets",
    "val_fraction", "val_step", "weight_decay",
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", default="config/normal.yml")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--resume", action="store_true",
                   help="restore params+optimizer+step from <ckpt_dir>/last")
    p.add_argument("--pretrained", default=None,
                   help="warm-start params from a converted torch .ckpt/.pth "
                        "or an Orbax checkpoint dir")
    args = p.parse_args(argv)
    cfg = yaml.safe_load(open(args.config_file))
    unknown = sorted(set(cfg) - KNOWN_KEYS)
    if unknown:
        print(f"[config] WARNING: ignoring unknown keys {unknown} "
              f"(known: {sorted(KNOWN_KEYS)})")

    import jax
    import jax.numpy as jnp

    from omnidata_tpu.data.loader import MixedLoader
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
    from omnidata_tpu.train.driver import (
        build_datasets,
        load_pretrained_variables,
        state_tree,
        try_resume,
    )
    from omnidata_tpu.train.loop import dump_val_images, run_validation

    image_size = int(cfg.get("image_size", 512))
    batch_size = int(cfg.get("batch_size", 16))
    lr = float(cfg.get("lr", 1e-4))
    wd = float(cfg.get("weight_decay", 2e-6))
    max_steps = args.max_steps or int(cfg.get("max_steps", 100000))
    ckpt_dir = args.checkpoint_dir or cfg.get("checkpoint_dir", "./checkpoints/normal")

    datasets, val_datasets = build_datasets(
        cfg, tasks=("rgb", "normal", "mask_valid"), image_size=image_size
    )
    if not datasets:
        raise SystemExit("no data_paths configured / found in config")

    n_model = int(cfg.get("model_parallel", 1))
    n_data = cfg.get("data_parallel")  # None = all remaining devices
    mesh = make_mesh(n_data=int(n_data) if n_data else None, n_model=n_model)
    model_kind = cfg.get("model", "unet")
    if model_kind == "dpt":
        model = DPTHybrid(num_channels=3)
    else:
        # remat by default: the reference's bs16 @ 512^2 config OOMs one
        # v5e chip by ~0.3 GB without it (models/unet.py UNet.remat)
        model = UNet(out_channels=3,
                     downsample=int(cfg.get("unet_downsample", 6)),
                     remat=bool(cfg.get("remat", True)))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
    )
    pretrained = args.pretrained or (
        cfg.get("pretrained_weights_path") if cfg.get("pretrained") else None
    )
    if pretrained:
        variables = load_pretrained_variables(
            pretrained, model_kind,
            unet_downsample=int(cfg.get("unet_downsample", 6)))
        print(f"warm-started from {pretrained}")
    variables = jax.device_put(variables, param_sharding(variables, mesh))
    state = create_train_state(variables, normal_optimizer(lr=lr, weight_decay=wd))

    def apply_fn(v, rgb_nchw):
        y = model.apply(v, jnp.transpose(rgb_nchw, (0, 2, 3, 1)))
        return jnp.transpose(y, (0, 3, 1, 2))

    augment = bool(cfg.get("augment", True))  # reference augments train rgb
    step_fn = jax.jit(make_normal_train_step(apply_fn, augment=augment,
                                             image_size=image_size),
                      donate_argnums=0)
    eval_fn = jax.jit(make_normal_eval_step(apply_fn))
    ckpt = CheckpointManager(ckpt_dir, save_top_k=int(cfg.get("save_top_k", 3)))
    if args.resume:
        state, resumed = try_resume(ckpt, state, mesh)
        if resumed:
            print(f"resumed from {ckpt_dir}/last at step {int(state.step)}")
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
        explog.log(step, {"val_normal_loss": val_loss})
        dump_val_images(ckpt_dir, step, sample)
        ckpt.save(state_tree(state), step, metric=val_loss)
        return val_loss

    step = int(state.step)
    log_step = int(cfg.get("log_step", 100))
    val_step = int(cfg.get("val_step", 3000))  # reference log_step: 3000
    ckpt_step = int(cfg.get("ckpt_step", 1000))
    loader = MixedLoader(datasets, batch_size,
                         num_workers=int(cfg.get("num_workers", 8)))
    from omnidata_tpu.utils.experiment import ExperimentLogger

    explog = ExperimentLogger(cfg.get("log_dir", ckpt_dir), config=cfg,
                              backend=cfg.get("log_backend", "auto"))
    t0 = time.time()
    done = 0
    with mesh:
        # per-process plans must differ or every host feeds the SAME
        # samples as different shards of the global batch
        for batch in loader.batches(
            steps=max_steps - step,
            seed=step * jax.process_count() + jax.process_index(),
        ):
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
            done += 1
            if step % log_step == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step}: {m} ({(time.time()-t0)/done:.2f}s/step)")
                explog.log(step, dict(m, sec_per_step=(time.time()-t0)/done))
            if step % val_step == 0:
                validate(step)
            if step % ckpt_step == 0:
                ckpt.save(state_tree(state), step, metric=None)
    ckpt.save(state_tree(state), step, metric=None)
    ckpt.wait_until_finished()  # drain the async save before exit
    explog.finish()
    print(f"done: {step} steps in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
