"""Train state + optimizers matching the reference's configs
(config/depth.yml: Adam lr 1e-5, grad-clip 10;
config/normal.yml: Adam lr 1e-4 wd 2e-6 amsgrad; train_*.py:381-386)."""
from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def depth_optimizer(lr: float = 1e-5, grad_clip: float = 10.0):
    return optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(lr))


def normal_optimizer(lr: float = 1e-4, weight_decay: float = 2e-6,
                     grad_clip: float = 10.0):
    # torch Adam(amsgrad) + L2-style weight decay
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),
        optax.amsgrad(lr),
    )


def create_train_state(params, tx) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )
