"""Model registry — the hub-style public API of the reference
(omnidata_tools/torch/README.md:23-29: torch.hub names
surface_normal_dpt_hybrid_384 / depth_dpt_hybrid_384 / dpt_hybrid_384).

Each entry returns (module, variables, apply_fn) where apply_fn is a jitted
NCHW->reference-convention forward so `demo.py` level code can stay
layout-agnostic. Checkpoints: pass a path to a torch .ckpt/.pth to load
converted pretrained weights; otherwise params are randomly initialized.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from .convert import convert_dpt, convert_unet
from .dpt import DPTHybrid
from .unet import UNet


class ModelBundle(NamedTuple):
    module: Any
    variables: dict
    apply: Callable  # apply(variables, x_nchw) -> reference-convention output


def _load_torch(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _load_checkpoint_variables(path: str, convert) -> dict:
    """checkpoint= accepts either a torch .ckpt/.pth (run through the weight
    converter, the reference's pretrained path) or an Orbax checkpoint
    DIRECTORY saved by train.checkpoints.CheckpointManager (full train-state
    tree or bare variables) — so eval/demo CLIs can consume checkpoints
    trained by this framework, not only converted torch ones."""
    import os

    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if isinstance(tree, dict) and "opt_state" in tree:  # full train state
            tree = tree["params"]
        return jax.tree.map(jnp.asarray, tree)
    return jax.tree.map(jnp.asarray, convert(_load_torch(path)))


def _nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def cast_params_bf16(variables: dict) -> dict:
    """Cast float32 params to bfloat16 for inference, EXCEPT normalization
    scale/bias (GroupNorm 'gn', LayerNorm 'norm*'): norm statistics are
    precision-sensitive and the params are tiny, so they stay float32 (the
    activations they touch promote back to f32, which XLA fuses for free;
    the HBM-bandwidth win comes from the conv/dense kernels)."""
    import jax.tree_util as jtu

    def cast(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        if any("norm" in n or n == "gn" for n in names):
            return x
        if hasattr(x, "dtype") and x.dtype == jnp.float32:
            return x.astype(jnp.bfloat16)
        return x

    return jtu.tree_map_with_path(cast, variables)


def dpt_hybrid_384(
    num_channels: int = 1, checkpoint: str | None = None, image_size: int = 384,
    dtype: str = "float32",
) -> ModelBundle:
    """DPT-hybrid; depth (C=1, output (B,H,W)) or normals (C=3, (B,3,H,W)).

    dtype='bfloat16' casts params for ~1.7x faster inference on TPU (head
    outputs are still float32-accumulated by the MXU)."""
    module = DPTHybrid(num_channels=num_channels)
    if checkpoint:
        variables = _load_checkpoint_variables(checkpoint, convert_dpt)
    else:
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
        )
    if dtype == "bfloat16":
        variables = cast_params_bf16(variables)

    @jax.jit
    def apply(variables, x_nchw):
        x = _nchw_to_nhwc(x_nchw)
        if dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        y = module.apply(variables, x).astype(jnp.float32)  # (B,H,W,C)
        if num_channels == 1:
            return y[..., 0]  # DPTDepthModel squeezes the channel
        return jnp.transpose(y, (0, 3, 1, 2))

    return ModelBundle(module, variables, apply)


def depth_dpt_hybrid_384(checkpoint: str | None = None, **kw) -> ModelBundle:
    return dpt_hybrid_384(num_channels=1, checkpoint=checkpoint, **kw)


def surface_normal_dpt_hybrid_384(checkpoint: str | None = None, **kw) -> ModelBundle:
    return dpt_hybrid_384(num_channels=3, checkpoint=checkpoint, **kw)


def surface_normal_unet(checkpoint: str | None = None, image_size: int = 512) -> ModelBundle:
    """The v1 UNet normal model (demo.py's commented v1 path, train_normal.py)."""
    module = UNet(out_channels=3)
    if checkpoint:
        variables = _load_checkpoint_variables(checkpoint, convert_unet)
    else:
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
        )

    @jax.jit
    def apply(variables, x_nchw):
        y = module.apply(variables, _nchw_to_nhwc(x_nchw))
        return jnp.transpose(y, (0, 3, 1, 2))

    return ModelBundle(module, variables, apply)


def midas_v21(checkpoint: str | None = None, image_size: int = 384) -> ModelBundle:
    """MiDaS v2.1 large: ResNeXt101-32x8d-wsl + plain fusion
    (modules/midas/midas_net.py). Converts midas_v21 torch checkpoints."""
    from .convert import convert_midas
    from .midas_full import MidasNet

    module = MidasNet()
    if checkpoint:
        variables = jax.tree.map(jnp.asarray, convert_midas(_load_torch(checkpoint)))
    else:
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
        )

    @jax.jit
    def apply(variables, x_nchw):
        return module.apply(variables, _nchw_to_nhwc(x_nchw))  # (B,H,W)

    return ModelBundle(module, variables, apply)


def midas_v21_small(checkpoint: str | None = None, image_size: int = 256) -> ModelBundle:
    """MiDaS v2.1 small: tf_efficientnet_lite3 + custom expanding fusion
    (modules/midas/midas_net_custom.py). Random init (no converter yet for
    the geffnet key layout)."""
    from .midas_full import MidasNetSmallTF

    module = MidasNetSmallTF()
    if checkpoint:
        from .convert import convert_midas_small

        variables = jax.tree.map(
            jnp.asarray, convert_midas_small(_load_torch(checkpoint))
        )
    else:
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
        )

    @jax.jit
    def apply(variables, x_nchw):
        return module.apply(variables, _nchw_to_nhwc(x_nchw))

    return ModelBundle(module, variables, apply)


def hrnet(variant: str = "w18", out_channels: int = 21,
          checkpoint: str | None = None, image_size: int = 129) -> ModelBundle:
    """Segmentation HRNet (paper_code/models/seg_hrnet.py get_configured_hrnet
    role); converts torch seg_hrnet checkpoints via convert_hrnet. Input
    spatial size must satisfy (s - 1) % 8 == 0 (the reference's assert)."""
    from .hrnet import HRNet, convert_hrnet

    module = HRNet(out_channels=out_channels, variant=variant)
    if checkpoint:
        variables = jax.tree.map(
            jnp.asarray, convert_hrnet(_load_torch(checkpoint), variant)
        )
    else:
        variables = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, image_size, image_size, 3))
        )

    @jax.jit
    def apply(variables, x_nchw):
        y = module.apply(variables, _nchw_to_nhwc(x_nchw))
        return jnp.transpose(y, (0, 3, 1, 2))

    return ModelBundle(module, variables, apply)


MODELS = {
    "dpt_hybrid_384": dpt_hybrid_384,
    "hrnet_w18": lambda **kw: hrnet("w18", **kw),
    "hrnet_w32": lambda **kw: hrnet("w32", **kw),
    "hrnet_w48": lambda **kw: hrnet("w48", **kw),
    "midas_v21": midas_v21,
    "midas_v21_small": midas_v21_small,
    "depth_dpt_hybrid_384": depth_dpt_hybrid_384,
    "surface_normal_dpt_hybrid_384": surface_normal_dpt_hybrid_384,
    "surface_normal_unet": surface_normal_unet,
}


def create_model(name: str, **kwargs) -> ModelBundle:
    if name not in MODELS:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODELS)}")
    return MODELS[name](**kwargs)
