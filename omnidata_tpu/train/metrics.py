"""Evaluation metrics (reference: paper_code/evaluation_metrics.py:13-110):
normals — mean/median angular error, % within 11.25/22.5/30 degrees, masked
L1/MSE x100; depth — log10, si-log, relative error, irmse.

Pure JAX except the masked median (host numpy for exactness on ragged valid
sets; tiny data). Inputs NCHW, masks (B,1,H,W) boolean.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(pred, target, mask):
    B, C, H, W = pred.shape
    p = jnp.transpose(pred, (0, 2, 3, 1)).reshape(-1, C)
    t = jnp.transpose(target, (0, 2, 3, 1)).reshape(-1, C)
    m = mask[:, 0].reshape(-1)
    return p, t, m


def normal_metrics(pred: jax.Array, target: jax.Array, mask: jax.Array) -> dict:
    """pred/target are unit-ish normal fields in [-1,1] (C=3)."""
    p, t, m = _flatten(pred, target, mask)
    mf = m.astype(jnp.float64) if p.dtype == jnp.float64 else m.astype(jnp.float32)
    nvalid = jnp.maximum(jnp.sum(mf), 1.0)

    norm = lambda a: jnp.sqrt(jnp.sum(a * a, 1))
    w12 = jnp.sum(p * t, 1)
    cos = jnp.clip(w12 / jnp.maximum(norm(p) * norm(t), 1e-8), -1.0, 1.0)
    ang = jnp.arccos(cos) * 180.0 / math.pi

    ang_mean = jnp.sum(ang * mf) / nvalid
    within = lambda d: jnp.sum((ang <= d) * mf) / nvalid

    # masked median on host (exact over the ragged valid set)
    ang_np = np.asarray(ang)
    m_np = np.asarray(m)
    ang_median = float(np.median(ang_np[m_np])) if m_np.any() else 0.0

    np_ = p / (norm(p)[:, None] + 2e-2)
    nt = t / (norm(t)[:, None] + 2e-2)
    diff = jnp.abs(np_ - nt) * mf[:, None]
    ratio = m.shape[0] / nvalid
    l1 = jnp.mean(jnp.abs(diff)) * ratio
    mse = jnp.mean(diff**2) * ratio

    return {
        "ang_error_mean": float(ang_mean),
        "ang_error_median": ang_median,
        "percentage_within_11.25_degrees": float(within(11.25)),
        "percentage_within_22.5_degrees": float(within(22.5)),
        "percentage_within_30_degrees": float(within(30.0)),
        "eval_L1": float(l1 * 100),
        "eval_mse": float(mse * 100),
    }


def depth_metrics(pred: jax.Array, target: jax.Array, mask: jax.Array) -> dict:
    """Depth in the reference's [0,1] encoding (C=1)."""
    p, t, m = _flatten(pred, target, mask)
    mf = m.astype(jnp.float32)[:, None]
    nvalid = jnp.maximum(jnp.sum(mf), 1.0)
    ratio = m.shape[0] / nvalid

    diff = jnp.abs(p - t) * mf
    log10_diff = jnp.mean(jnp.log(1 + 64 * diff) * mf) * ratio
    logs = jnp.abs(jnp.log(1 + 64 * p) - jnp.log(1 + 64 * t)) * mf
    log10 = jnp.mean(logs) * ratio
    si_log = jnp.sum(logs**2) / nvalid - (jnp.sum(logs) ** 2) / (nvalid**2)
    rel = jnp.mean(diff / jnp.maximum(t, 1e-12) * mf) * ratio
    irmse = jnp.mean(((1.0 / (1 + 64 * p) - 1.0 / (1 + 64 * t)) ** 2) * mf) * ratio
    l1 = jnp.mean(diff) * ratio
    mse = jnp.mean(diff**2) * ratio

    return {
        "eval_L1": float(l1 * 100),
        "eval_mse": float(mse * 100),
        "log10_diff": float(log10_diff),
        "log10": float(log10),
        "si_log": float(si_log),
        "rel_error": float(rel),
        "irmse": float(irmse),
    }
