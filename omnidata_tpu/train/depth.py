"""Depth training step — pjit data-parallel (+optional tensor-parallel) port
of the reference's _shared_step (train_depth.py:245-287).

Loss schedule (train_depth.py:274-279): SSI-only for the first 15k steps,
then ssi + 0.1 * gradient-matching + 10 * virtual-normal. Grad-clip 10,
Adam lr 1e-5. rgb in [-1,1]; predictions clamped to [0,1]; the valid mask is
max-pool dilated (make_valid_mask, train_depth.py:215-242).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..data.masks import make_valid_mask
from ..losses import VNLParams, midas_loss, virtual_normal_loss
from .state import TrainState

SSI_ONLY_STEPS = 15_000
VNL_WEIGHT = 10.0
REG_WEIGHT = 0.1


def depth_loss_fn(
    params,
    apply_fn,
    batch: dict,
    step: jax.Array,
    key: jax.Array,
    vnl_params: VNLParams,
):
    """batch: rgb (B,3,H,W) in [-1,1] · depth (B,1,H,W) in [0,1] ·
    mask_valid (B,1,H,W) bool."""
    pred = apply_fn(params, batch["rgb"])  # (B,H,W)
    pred = jnp.clip(pred, 0.0, 1.0)[:, None]
    mask = make_valid_mask(batch["mask_valid"], 4)
    total, ssi, reg = midas_loss(pred, batch["depth"], mask, alpha=REG_WEIGHT)
    # reference train_depth.py:272 passes PREDICTIONS in the gt_depth slot
    # (vnl_loss(depth_preds, depth_gt)), so triplet filtering keys on pred
    vnl = virtual_normal_loss(pred, batch["depth"], key, vnl_params)
    loss = jnp.where(
        step < SSI_ONLY_STEPS, ssi, ssi + REG_WEIGHT * reg + VNL_WEIGHT * vnl
    )
    return loss, {"loss": loss, "ssi": ssi, "reg": reg, "vnl": vnl}


def make_depth_train_step(apply_fn, vnl_params: VNLParams,
                          augment: bool = False, image_size: int = 384):
    """Returns train_step(state, batch, key) -> (state, metrics). jit with
    shardings applied by the caller (see train.parallel).

    augment=True applies the reference's in-step train augmentation
    (train_depth.py:245-253): resize/crop to image_size then the rgb cascade.
    With augment, batch['rgb'] must be in [0,1] (normalized to [-1,1] after
    augmenting, matching the transform+aug order of the reference)."""

    def train_step(state: TrainState, batch: dict, key: jax.Array):
        if augment:
            from ..augment import augment_rgb, resize_crop

            key, k1, k2 = jax.random.split(key, 3)
            batch = dict(batch)
            batch = resize_crop(batch, k1, image_size)
            batch["mask_valid"] = batch["mask_valid"] > 0.5
            batch["rgb"] = augment_rgb(batch["rgb"], k2) * 2.0 - 1.0
        grad_fn = jax.value_and_grad(depth_loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.params, apply_fn, batch, state.step, key, vnl_params
        )
        return state.apply_gradients(grads), metrics

    return train_step


def make_depth_eval_step(apply_fn, vnl_params: VNLParams):
    """eval_step(params, batch, key) -> (metrics, pred) — validation loss in
    the reference's post-schedule form (ssi + 0.1 reg + 10 vnl; no aug,
    train_depth.py:252-253, validation_epoch_end)."""

    def eval_step(params, batch: dict, key: jax.Array):
        pred = jnp.clip(apply_fn(params, batch["rgb"]), 0.0, 1.0)[:, None]
        mask = make_valid_mask(batch["mask_valid"], 4)
        total, ssi, reg = midas_loss(pred, batch["depth"], mask, alpha=REG_WEIGHT)
        vnl = virtual_normal_loss(pred, batch["depth"], key, vnl_params)
        loss = ssi + REG_WEIGHT * reg + VNL_WEIGHT * vnl
        return {"val_depth_loss": loss, "ssi": ssi, "reg": reg, "vnl": vnl}, pred

    return eval_step
