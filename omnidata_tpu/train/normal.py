"""Surface-normal training step (reference: train_normal.py:256-258):
loss = masked cosine-angular + 10 * masked L1 over the dilated valid mask;
Adam amsgrad lr 1e-4, wd 2e-6, grad-clip 10.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.masks import make_valid_mask
from ..losses import masked_cosine_angular_loss, masked_l1_loss
from .state import TrainState

L1_WEIGHT = 10.0


def normal_loss_fn(params, apply_fn, batch: dict):
    """batch: rgb (B,3,H,W) in [0,1] · normal (B,3,H,W) in [0,1] ·
    mask_valid (B,1,H,W) bool."""
    pred = apply_fn(params, batch["rgb"])  # (B,3,H,W)
    pred = jnp.clip(pred, 0.0, 1.0)
    mask1 = make_valid_mask(batch["mask_valid"], 4)
    mask3 = jnp.repeat(mask1, 3, axis=1)
    cos = masked_cosine_angular_loss(pred, batch["normal"], mask3)
    l1 = masked_l1_loss(pred, batch["normal"], mask3)
    loss = cos + L1_WEIGHT * l1
    return loss, {"loss": loss, "cos": cos, "l1": l1}


def make_normal_train_step(apply_fn, augment: bool = False,
                           image_size: int = 512):
    """augment=True applies the reference's in-step train augmentation
    (train_normal.py:237-241: resize_augmentation on the whole batch, then
    the rgb cascade). Signature stays (state, batch) when augment=False."""

    def train_step(state: TrainState, batch: dict, key: jax.Array = None):
        if augment:
            from ..augment import augment_rgb, resize_crop

            key, k1, k2 = jax.random.split(key, 3)
            batch = dict(batch)
            batch = resize_crop(batch, k1, image_size)
            batch["mask_valid"] = batch["mask_valid"] > 0.5
            batch["rgb"] = augment_rgb(batch["rgb"], k2)
        grad_fn = jax.value_and_grad(normal_loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, apply_fn, batch)
        return state.apply_gradients(grads), metrics

    return train_step


def make_normal_eval_step(apply_fn):
    """eval_step(params, batch) -> (metrics, pred); no augmentation
    (train_normal.py validation path)."""

    def eval_step(params, batch: dict):
        pred = jnp.clip(apply_fn(params, batch["rgb"]), 0.0, 1.0)
        mask3 = jnp.repeat(make_valid_mask(batch["mask_valid"], 4), 3, axis=1)
        cos = masked_cosine_angular_loss(pred, batch["normal"], mask3)
        l1 = masked_l1_loss(pred, batch["normal"], mask3)
        loss = cos + L1_WEIGHT * l1
        return {"val_normal_loss": loss, "cos": cos, "l1": l1}, pred

    return eval_step
