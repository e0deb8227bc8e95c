"""Device-mesh + sharding utilities — the TPU-native replacement for the
reference's Lightning DDP/NCCL setup (train_normal.py:376-378; SURVEY.md §2f).

The reference is data-parallel only (a ~123M-param DPT fits on one chip).
Here we expose a 2D ('data', 'model') mesh: gradients all-reduce over 'data'
via XLA psum (ICI), and the ViT's big matmuls optionally shard over 'model'
(Megatron-style column/row splits of qkv/proj/mlp) so the same code scales
past one chip per replica. Collectives are inserted by XLA from the
NamedSharding annotations — no hand-written comms.
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Megatron-style tensor-parallel layout for the DPT's transformer:
#   column-split the fused qkv and mlp.fc1 (output dim), row-split attn.proj
#   and mlp.fc2 (input dim). Everything else is replicated.
_TP_RULES = [
    (re.compile(r".*attn/qkv/kernel$"), P(None, "model")),
    (re.compile(r".*attn/qkv/bias$"), P("model")),
    (re.compile(r".*attn/proj/kernel$"), P("model", None)),
    (re.compile(r".*mlp/fc1/kernel$"), P(None, "model")),
    (re.compile(r".*mlp/fc1/bias$"), P("model")),
    (re.compile(r".*mlp/fc2/kernel$"), P("model", None)),
]


def param_sharding(tree: Any, mesh: Mesh, tensor_parallel: bool = True):
    """NamedSharding tree for a params pytree: TP rules where they match,
    replicated elsewhere."""

    def spec_for(path: str, leaf) -> NamedSharding:
        if tensor_parallel and mesh.shape["model"] > 1:
            for rx, spec in _TP_RULES:
                if rx.match(path) and leaf.ndim == len(spec):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = {
        jax.tree_util.keystr(p): spec_for(
            "/".join(str(getattr(k, "key", k)) for k in p), v
        )
        for p, v in flat[0]
    }
    out = jax.tree_util.tree_unflatten(
        flat[1], [leaves[jax.tree_util.keystr(p)] for p, _ in flat[0]]
    )
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
