"""train_multitask.py — multi-task training driver (reference:
paper_code/train_multi_task_*.py over MultiTaskModel/MTAN/PADNet/CrossStitch
with GradNorm loss balancing, losses/loss_balancing.py).

    python train_multitask.py --data_path <annotated dir> \
        [--arch multitask|mtan|padnet|crossstitch] [--max_steps N]

Tasks: depth_zbuffer (masked L1 on [0,1] depth) + normal (cos + L1).
Loss weights rebalanced every `balance_every` steps by GradNorm.
"""
from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--arch", default="multitask",
                   choices=["multitask", "mtan", "padnet", "crossstitch"])
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--balance_every", type=int, default=100)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.losses import masked_cosine_angular_loss, masked_l1_loss
    from omnidata_tpu.models import MTAN, CrossStitch, MultiTaskModel, PADNet
    from omnidata_tpu.models import grad_norm_weights
    from omnidata_tpu.train import create_train_state

    cls = {"multitask": MultiTaskModel, "mtan": MTAN, "padnet": PADNet,
           "crossstitch": CrossStitch}[args.arch]
    tasks = {"depth_zbuffer": 1, "normal": 3}
    model = cls(tasks=tasks)
    S = args.image_size
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)))

    ds = OmnidataDataset(
        Options(
            data_path=args.data_path,
            tasks=("rgb", "depth_zbuffer", "normal", "mask_valid"),
            image_size=S,
            random_flip=True,
        )
    )
    if len(ds) == 0:
        raise SystemExit("no complete samples found")

    def losses_fn(params, batch):
        x = jnp.transpose(batch["rgb"], (0, 2, 3, 1))
        out = model.apply(params, x)
        mask = batch["mask_valid"] > 0.5
        pred_d = jnp.transpose(out["depth_zbuffer"], (0, 3, 1, 2))
        pred_n = jnp.clip(jnp.transpose(out["normal"], (0, 3, 1, 2)), 0.0, 1.0)
        ld = masked_l1_loss(pred_d, batch["depth_zbuffer"], mask)
        m3 = jnp.repeat(mask, 3, 1)
        ln = masked_cosine_angular_loss(pred_n, batch["normal"], m3) + \
            masked_l1_loss(pred_n, batch["normal"], m3)
        return {"depth_zbuffer": ld, "normal": ln}

    weights = {t: 1.0 for t in tasks}
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(args.lr))
    state = create_train_state(variables, tx)

    @jax.jit
    def step_fn(state, batch, w_d, w_n):
        def total(params):
            ls = losses_fn(params, batch)
            return w_d * ls["depth_zbuffer"] + w_n * ls["normal"], ls

        (_, ls), grads = jax.value_and_grad(total, has_aux=True)(state.params)
        return state.apply_gradients(grads), ls

    @jax.jit
    def per_task_grad_norms(params, batch):
        out = {}
        for t in tasks:
            g = jax.grad(lambda p: losses_fn(p, batch)[t])(params)
            leaves = jax.tree_util.tree_leaves(g)
            out[t] = jnp.sqrt(sum(jnp.sum(x * x) for x in leaves))
        return out

    initial = None
    step, t0 = 0, time.time()
    while step < args.max_steps:
        for nb in ds.batches(args.batch_size):
            batch = {
                "rgb": jnp.asarray(nb["rgb"], jnp.float32),
                "depth_zbuffer": jnp.asarray(nb["depth_zbuffer"], jnp.float32),
                "normal": jnp.asarray(nb["normal"], jnp.float32),
                "mask_valid": jnp.asarray(nb["mask_valid"] > 0.5),
            }
            state, ls = step_fn(state, batch, weights["depth_zbuffer"], weights["normal"])
            step += 1
            if initial is None:
                initial = {k: float(v) for k, v in ls.items()}
            if step % args.balance_every == 0:
                gn = per_task_grad_norms(state.params, batch)
                weights = {
                    k: float(v) for k, v in grad_norm_weights(
                        {k: float(v) for k, v in ls.items()},
                        {k: float(v) for k, v in gn.items()},
                        initial_losses=initial,
                    ).items()
                }
                print(f"step {step}: losses={ {k: float(v) for k, v in ls.items()} } "
                      f"weights={weights} ({(time.time()-t0)/step:.2f}s/step)")
            if step >= args.max_steps:
                break
    print(f"done: {step} steps")
    return state


if __name__ == "__main__":
    main()
