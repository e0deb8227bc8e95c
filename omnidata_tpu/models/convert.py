"""Torch-checkpoint -> Flax-params converters.

The published omnidata checkpoints (omnidata_dpt_{depth,normal}_v2.ckpt,
omnidata_unet_normal_v1.pth) store timm-0.4.x / reference-module state dicts
(see demo.py:64-72 for the 'state_dict' + key-prefix stripping). These
functions map them onto our Flax modules:

- conv weights:   torch (O, I, kh, kw)  -> flax (kh, kw, I, O)
- linear weights: torch (O, I)          -> flax (I, O)
- norm weight/bias -> scale/bias

Every mapping is expressed as (flax_path, torch_key, kind) triples generated
programmatically, so the inverse direction (used by tests to synthesize a
torch state dict) is exact.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np


def _dpt_mapping(vit_blocks: int = 12, layers=(3, 4, 9)) -> Iterator[tuple]:
    """Yield (flax_path, torch_key_base, kind) for DPTHybrid.

    kind: 'conv' | 'conv_nobias' | 'linear' | 'norm' | 'raw'.
    flax_path is a '/'-joined path into the params tree; for 'conv'/'linear'
    the kernel/bias leaves are implied; for 'norm' scale/bias.
    """
    # ResNetV2 backbone
    bb = "pretrained.model.patch_embed.backbone"
    yield ("backbone/stem_conv", f"{bb}.stem.conv", "conv_nobias")
    yield ("backbone/stem_norm/gn", f"{bb}.stem.norm", "norm")
    for s, n in enumerate(layers):
        for b in range(n):
            base = f"{bb}.stages.{s}.blocks.{b}"
            fb = f"backbone/stage{s}_block{b}"
            for i in (1, 2, 3):
                yield (f"{fb}/conv{i}", f"{base}.conv{i}", "conv_nobias")
                yield (f"{fb}/norm{i}/gn", f"{base}.norm{i}", "norm")
            if b == 0:
                yield (f"{fb}/downsample_conv", f"{base}.downsample.conv", "conv_nobias")
                yield (f"{fb}/downsample_norm/gn", f"{base}.downsample.norm", "norm")
    # ViT
    pm = "pretrained.model"
    yield ("cls_token", f"{pm}.cls_token", "raw")
    yield ("pos_embed", f"{pm}.pos_embed", "raw")
    yield ("patch_proj", f"{pm}.patch_embed.proj", "conv")
    for i in range(vit_blocks):
        base = f"{pm}.blocks.{i}"
        fb = f"block{i}"
        yield (f"{fb}/norm1", f"{base}.norm1", "ln")
        yield (f"{fb}/attn/qkv", f"{base}.attn.qkv", "linear")
        yield (f"{fb}/attn/proj", f"{base}.attn.proj", "linear")
        yield (f"{fb}/norm2", f"{base}.norm2", "ln")
        yield (f"{fb}/mlp/fc1", f"{base}.mlp.fc1", "linear")
        yield (f"{fb}/mlp/fc2", f"{base}.mlp.fc2", "linear")
    yield ("norm", f"{pm}.norm", "ln")
    # timm's ImageNet classifier head: present in the published
    # omnidata_dpt_*_v2.ckpt files (vit.py:483 create_model defaults to
    # num_classes=1000 and demo.py:72 load_state_dict is strict) but never
    # executed by DPT.forward; consume + drop.
    yield (None, f"{pm}.head", ("linear_drop", (1000, 768)))
    # readout + postprocess (act_postprocess3/4: [ProjectReadout, Transpose,
    # Unflatten, Conv1x1, (Conv3x3 s2 for 4)] — vit.py:432-460)
    yield ("readout3/project", "pretrained.act_postprocess3.0.project.0", "linear")
    yield ("postprocess3_conv", "pretrained.act_postprocess3.3", "conv")
    yield ("readout4/project", "pretrained.act_postprocess4.0.project.0", "linear")
    yield ("postprocess4_conv", "pretrained.act_postprocess4.3", "conv")
    yield ("postprocess4_down", "pretrained.act_postprocess4.4", "conv")
    # scratch
    for i in (1, 2, 3, 4):
        yield (f"layer{i}_rn", f"scratch.layer{i}_rn", "conv_nobias")
        fb = f"refinenet{i}"
        for j in (1, 2):
            # refinenet4 is called with a single input, so its resConfUnit1
            # params exist in torch checkpoints but are never used
            # (dpt_depth.py:78 path_4 = refinenet4(layer_4_rn)); drop them.
            kind = "conv_drop" if (i == 4 and j == 1) else "conv"
            yield (f"{fb}/rcu{j}/conv1", f"scratch.refinenet{i}.resConfUnit{j}.conv1", kind)
            yield (f"{fb}/rcu{j}/conv2", f"scratch.refinenet{i}.resConfUnit{j}.conv2", kind)
        yield (f"{fb}/out_conv", f"scratch.refinenet{i}.out_conv", "conv")
    # head (nn.Sequential indices 0,2,4 — dpt_depth.py:91-99)
    yield ("head_conv1", "scratch.output_conv.0", "conv")
    yield ("head_conv2", "scratch.output_conv.2", "conv")
    yield ("head_conv3", "scratch.output_conv.4", "conv")


def _unet_mapping(downsample: int = 6) -> Iterator[tuple]:
    """(flax_path, torch_key_base, kind) for UNet (modules/unet.py:57-106)."""

    def block(fb, tb):
        for i in (1, 2, 3):
            yield (f"{fb}/conv{i}", f"{tb}.conv{i}", "conv")
            yield (f"{fb}/bn{i}", f"{tb}.bn{i}", "norm")

    yield from block("down1", "down1")
    for i in range(downsample):
        yield from block(f"down_blocks{i}", f"down_blocks.{i}")
    for i in (1, 2, 3):
        yield (f"mid_conv{i}", f"mid_conv{i}", "conv")
        yield (f"mid_bn{i}", f"bn{i}", "norm")
    for i in range(downsample):
        yield from block(f"up_blocks{i}", f"up_blocks.{i}")
    yield ("last_conv1", "last_conv1", "conv")
    yield ("last_bn", "last_bn", "norm")
    yield ("last_conv2", "last_conv2", "conv")


def _set(tree: dict, path: str, leaf: str, value: np.ndarray):
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf] = value


def _convert(mapping, state_dict: dict) -> dict:
    params: dict = {}
    batch_stats: dict = {}
    used = set()

    def take(key):
        used.add(key)
        t = state_dict[key]
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    for flax_path, tkey, kind in mapping:
        if kind == "conv_drop" or (
            isinstance(kind, tuple) and kind[0] in ("conv_drop", "linear_drop")
        ):
            take(f"{tkey}.weight")
            if f"{tkey}.bias" in state_dict:
                take(f"{tkey}.bias")
        elif kind in ("conv", "conv_nobias"):
            w = take(f"{tkey}.weight").transpose(2, 3, 1, 0)
            _set(params, flax_path, "kernel", w)
            if kind == "conv" and f"{tkey}.bias" in state_dict:
                _set(params, flax_path, "bias", take(f"{tkey}.bias"))
        elif kind == "linear":
            _set(params, flax_path, "kernel", take(f"{tkey}.weight").T)
            if f"{tkey}.bias" in state_dict:
                _set(params, flax_path, "bias", take(f"{tkey}.bias"))
        elif kind in ("norm", "ln"):
            _set(params, flax_path, "scale", take(f"{tkey}.weight"))
            _set(params, flax_path, "bias", take(f"{tkey}.bias"))
        elif kind == "bn":
            _set(params, flax_path, "scale", take(f"{tkey}.weight"))
            _set(params, flax_path, "bias", take(f"{tkey}.bias"))
            _set(batch_stats, flax_path, "mean", take(f"{tkey}.running_mean"))
            _set(batch_stats, flax_path, "var", take(f"{tkey}.running_var"))
        elif kind == "raw":
            if "/" in flax_path:
                path, leaf = flax_path.rsplit("/", 1)
                _set(params, path, leaf, take(tkey))
            else:
                params[flax_path] = take(tkey)
        else:
            raise ValueError(kind)
    unused = [k for k in state_dict if k not in used and "num_batches" not in k]
    if unused:
        raise ValueError(f"unconverted torch keys: {unused[:10]} (+{max(0,len(unused)-10)} more)")
    if batch_stats:
        return {"params": params, "batch_stats": batch_stats}
    return {"params": params}


def _set_root(tree: dict, name: str, value: np.ndarray):
    tree[name] = value


def strip_prefix(state_dict: dict, prefixes=("state_dict",)) -> dict:
    """Undo Lightning wrapping: checkpoint['state_dict'] with 'model.' prefix
    (demo.py:64-72 strips k[6:])."""
    if "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    out = {}
    for k, v in state_dict.items():
        for p in ("model.model.", "model."):
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def convert_dpt(state_dict: dict) -> dict:
    """timm/reference DPT-hybrid state dict -> DPTHybrid Flax variables."""
    return _convert(_dpt_mapping(), strip_prefix(state_dict))


def convert_unet(state_dict: dict, downsample: int = 6) -> dict:
    """reference UNet state dict -> UNet Flax variables."""
    return _convert(_unet_mapping(downsample), strip_prefix(state_dict))


def synthesize_torch_state_dict(mapping, flax_params: dict) -> dict:
    """Inverse direction (tests): build a torch-layout state dict with the
    exact shapes our Flax model expects."""
    import jax

    flat = {"/".join(str(p.key) for p in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
            for v in [v]}
    bs_flat = {}
    if "batch_stats" in flax_params:
        bs_flat = {
            "/".join(str(p.key) for p in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(
                flax_params["batch_stats"])[0]
            for v in [v]
        }
    sd = {}
    for flax_path, tkey, kind in mapping:
        if kind == "conv_drop" or (
            isinstance(kind, tuple) and kind[0] in ("conv_drop", "linear_drop")
        ):
            # params unused by our forward; synthesize zeros
            shape = kind[1] if isinstance(kind, tuple) else (256, 256, 3, 3)
            sd[f"{tkey}.weight"] = np.zeros(shape, np.float32)
            sd[f"{tkey}.bias"] = np.zeros((shape[0],), np.float32)
        elif kind in ("conv", "conv_nobias"):
            sd[f"{tkey}.weight"] = flat[f"{flax_path}/kernel"].transpose(3, 2, 0, 1)
            if f"{flax_path}/bias" in flat:
                sd[f"{tkey}.bias"] = flat[f"{flax_path}/bias"]
        elif kind == "linear":
            sd[f"{tkey}.weight"] = flat[f"{flax_path}/kernel"].T
            if f"{flax_path}/bias" in flat:
                sd[f"{tkey}.bias"] = flat[f"{flax_path}/bias"]
        elif kind in ("norm", "ln"):
            sd[f"{tkey}.weight"] = flat[f"{flax_path}/scale"]
            sd[f"{tkey}.bias"] = flat[f"{flax_path}/bias"]
        elif kind == "bn":
            sd[f"{tkey}.weight"] = flat[f"{flax_path}/scale"]
            sd[f"{tkey}.bias"] = flat[f"{flax_path}/bias"]
            sd[f"{tkey}.running_mean"] = bs_flat[f"{flax_path}/mean"]
            sd[f"{tkey}.running_var"] = bs_flat[f"{flax_path}/var"]
        elif kind == "raw":
            sd[tkey] = flat[flax_path]
    return sd


def _midas_mapping(layers=(3, 4, 23, 3)) -> Iterator[tuple]:
    """MiDaS v2.1 large (MidasNet: ResNeXt101-wsl + plain fusion decoder).

    Torch layout per midas_net.py + blocks._make_resnet_backbone: stage 1 is
    Sequential(conv1, bn1, relu, maxpool, resnet.layer1) so its keys are
    pretrained.layer1.{0,1,4.b}; stages 2-4 are resnet.layer{2,3,4}
    directly."""
    yield "pretrained/conv1", "pretrained.layer1.0", "conv_nobias"
    yield "pretrained/bn1", "pretrained.layer1.1", "bn"
    for si, n_blocks in enumerate(layers):
        tstage = (f"pretrained.layer1.4" if si == 0
                  else f"pretrained.layer{si + 1}")
        for b in range(n_blocks):
            fb = f"pretrained/layer{si + 1}_block{b}"
            tb = f"{tstage}.{b}"
            for i in (1, 2, 3):
                yield f"{fb}/conv{i}", f"{tb}.conv{i}", "conv_nobias"
                yield f"{fb}/bn{i}", f"{tb}.bn{i}", "bn"
            if b == 0:
                yield f"{fb}/downsample_conv", f"{tb}.downsample.0", "conv_nobias"
                yield f"{fb}/downsample_bn", f"{tb}.downsample.1", "bn"
    for i in (1, 2, 3, 4):
        yield f"layer{i}_rn", f"scratch.layer{i}_rn", "conv_nobias"
        for u in (1, 2):
            for c in (1, 2):
                if i == 4 and u == 1:
                    # refinenet4 gets no skip input; its resConfUnit1 exists
                    # in torch checkpoints but is never executed
                    yield (None, f"scratch.refinenet4.resConfUnit1.conv{c}",
                           "conv_drop")
                else:
                    yield (f"refinenet{i}/resConfUnit{u}/conv{c}",
                           f"scratch.refinenet{i}.resConfUnit{u}.conv{c}",
                           "conv")
    yield "output_conv1", "scratch.output_conv.0", "conv"
    yield "output_conv2", "scratch.output_conv.2", "conv"
    yield "output_conv3", "scratch.output_conv.4", "conv"


def convert_midas(state_dict: dict) -> dict:
    """MiDaS v2.1 (midas_v21-f6b98070.pt style) -> MidasNet Flax variables."""
    return _convert(_midas_mapping(), strip_prefix(state_dict))


# tf_efficientnet_lite3 stage repeats (lite: first/last not depth-scaled)
_LITE3_REPEATS = (1, 3, 3, 5, 5, 6, 1)

# stage index -> torch Sequential prefix inside _make_efficientnet_backbone
# (blocks.py:88-98: layer1 = Sequential(conv_stem, bn1, act1, blocks[0],
# blocks[1]) so stages 0/1 sit at indices 3/4; later layers wrap the stage
# Sequentials directly)
_LITE3_STAGE_PREFIX = {
    0: "pretrained.layer1.3",
    1: "pretrained.layer1.4",
    2: "pretrained.layer2.0",
    3: "pretrained.layer3.0",
    4: "pretrained.layer3.1",
    5: "pretrained.layer4.0",
    6: "pretrained.layer4.1",
}


def _midas_small_mapping() -> Iterator[tuple]:
    """MiDaS v2.1 small (midas_net_custom.py MidasNet_small,
    tf_efficientnet_lite3 via geffnet). Stage-0 blocks are geffnet
    DepthwiseSeparableConv (conv_dw/bn1/conv_pw/bn2 — the project conv is
    named conv_pw there); the rest are InvertedResidual
    (conv_pw/bn1/conv_dw/bn2/conv_pwl/bn3)."""
    yield "pretrained/conv_stem", "pretrained.layer1.0", "conv_nobias"
    yield "pretrained/bn1", "pretrained.layer1.1", "bn"
    for si, reps in enumerate(_LITE3_REPEATS):
        for bi in range(reps):
            fb = f"pretrained/blocks_{si}_{bi}"
            tb = f"{_LITE3_STAGE_PREFIX[si]}.{bi}"
            if si == 0:  # DepthwiseSeparableConv
                yield f"{fb}/conv_dw", f"{tb}.conv_dw", "conv_nobias"
                yield f"{fb}/bn2", f"{tb}.bn1", "bn"
                yield f"{fb}/conv_pwl", f"{tb}.conv_pw", "conv_nobias"
                yield f"{fb}/bn3", f"{tb}.bn2", "bn"
            else:
                yield f"{fb}/conv_pw", f"{tb}.conv_pw", "conv_nobias"
                yield f"{fb}/bn1", f"{tb}.bn1", "bn"
                yield f"{fb}/conv_dw", f"{tb}.conv_dw", "conv_nobias"
                yield f"{fb}/bn2", f"{tb}.bn2", "bn"
                yield f"{fb}/conv_pwl", f"{tb}.conv_pwl", "conv_nobias"
                yield f"{fb}/bn3", f"{tb}.bn3", "bn"
    feats = {1: 64, 2: 128, 3: 256, 4: 512}
    for i in (1, 2, 3, 4):
        yield f"layer{i}_rn", f"scratch.layer{i}_rn", "conv_nobias"
        for u in (1, 2):
            for c in (1, 2):
                if i == 4 and u == 1:
                    f4 = feats[4]
                    yield (None, f"scratch.refinenet4.resConfUnit1.conv{c}",
                           ("conv_drop", (f4, f4, 3, 3)))
                else:
                    yield (f"refinenet{i}/resConfUnit{u}_conv{c}",
                           f"scratch.refinenet{i}.resConfUnit{u}.conv{c}",
                           "conv")
        yield f"refinenet{i}/out_conv", f"scratch.refinenet{i}.out_conv", "conv"
    yield "output_conv1", "scratch.output_conv.0", "conv"
    yield "output_conv2", "scratch.output_conv.2", "conv"
    yield "output_conv3", "scratch.output_conv.4", "conv"


def convert_midas_small(state_dict: dict) -> dict:
    """midas_v21_small torch checkpoint -> MidasNetSmallTF Flax variables."""
    return _convert(_midas_small_mapping(), strip_prefix(state_dict))
