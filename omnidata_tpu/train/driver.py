"""Shared train-driver plumbing for train_depth.py / train_normal.py:

- component dataset construction honoring the reference config schema
  (config/depth.yml: data_paths + train_datasets / val_datasets toggles +
  taskonomy_variant subset ladder)
- resume from the Orbax 'last' checkpoint (reference Lightning resume /
  ModelCheckpoint save_last, train_normal.py:371-374)
- warm-start from a pretrained checkpoint (reference pretrained_weights_path,
  train_normal.py:78-87 prefix-stripped torch load)
"""
from __future__ import annotations

import os


def build_datasets(cfg: dict, tasks: tuple, image_size: int):
    """-> (train_datasets, val_datasets) lists of OmnidataDataset.

    Schema (reference config/depth.yml):
      data_paths: {component: path}            # missing paths skipped
      train_datasets: {component: bool}        # default True
      val_datasets: {component: bool}          # default True
      taskonomy_variant: debug|tiny|medium|full|fullplus  # building ladder
      val_data_paths: {component: path}        # explicit val roots (ours)
      val_fraction: float                      # holdout when no explicit val

    Validation comes from explicit val_data_paths when given, else from a
    per-component (building, point)-grouped holdout of each val-enabled
    component.
    """
    from ..data.dataset import OmnidataDataset, Options
    from ..data.splits import SUBSETS, subset_ladder

    variant = cfg.get("taskonomy_variant")
    train_on = cfg.get("train_datasets") or {}
    val_on = cfg.get("val_datasets") or {}
    cache_dir = cfg.get("cache_dir")

    def make(path, train):
        return OmnidataDataset(Options(
            data_path=path, tasks=tasks, image_size=image_size,
            random_flip=train, cache_dir=cache_dir,
        ))

    per_comp = []  # (component, dataset) for every present component
    for comp, path in (cfg.get("data_paths") or {}).items():
        if not path or not os.path.isdir(path):
            continue
        if not (train_on.get(comp, True) or val_on.get(comp, True)):
            continue
        ds = make(path, train=True)
        if comp == "taskonomy" and variant:
            if variant not in SUBSETS:
                raise SystemExit(
                    f"unknown taskonomy_variant {variant!r} (one of {SUBSETS})"
                )
            ds = ds.filter_buildings(subset_ladder(ds.buildings())[variant])
        if len(ds):
            per_comp.append((comp, ds))

    explicit_val = []
    for comp, path in (cfg.get("val_data_paths") or {}).items():
        if path and os.path.isdir(path) and val_on.get(comp, True):
            explicit_val.append(make(path, train=False))

    def as_val(ds):
        """Validation view of a dataset: deterministic (no random flip),
        like the reference's train=False val transforms."""
        import copy
        import dataclasses

        ds = copy.copy(ds)
        ds.o = dataclasses.replace(ds.o, random_flip=False)
        return ds

    trains, vals = [], []
    if explicit_val:
        trains = [ds for comp, ds in per_comp if train_on.get(comp, True)]
        vals = explicit_val
    else:
        frac = float(cfg.get("val_fraction", 0.05))
        for comp, ds in per_comp:
            if not val_on.get(comp, True):  # train-only component
                trains.append(ds)
                continue
            if not train_on.get(comp, True):  # val-only: ALL samples validate
                vals.append(as_val(ds))
                continue
            tr, va = ds.holdout(frac)
            if len(tr) == 0 or len(va) == 0:  # too small to split
                trains.append(ds)
                continue
            trains.append(tr)
            vals.append(as_val(va))

    pack_dir = cfg.get("packed_cache")
    if pack_dir:
        # decode-once binary sample cache (data/packed_cache.py): samples
        # become mmap row reads + crop/flip — the SURVEY §7.7 "1000
        # views/sec dataloading" design. Packs are keyed on each dataset's
        # resolved index, so train/val splits never alias.
        from ..data.packed_cache import PackedDataset

        workers = int(cfg.get("num_workers", 8))
        trains = [PackedDataset.build(d, pack_dir, workers) for d in trains]
        vals = [PackedDataset.build(d, pack_dir, workers) for d in vals]
    return trains, vals


def load_pretrained_variables(path: str, model_kind: str,
                              unet_downsample: int = 6) -> dict:
    """--pretrained: Flax variables from either an Orbax checkpoint directory
    (a tree saved by CheckpointManager — full train state or bare variables)
    or a torch .ckpt/.pth file run through the weight converter
    (reference train_normal.py:78-87 / demo.py:64-72)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        if isinstance(tree, dict) and "opt_state" in tree:  # full train state
            tree = tree["params"]
        return tree
    import torch

    from ..models.convert import convert_dpt, convert_unet

    sd = torch.load(path, map_location="cpu")
    if model_kind == "dpt":
        return convert_dpt(sd)
    return convert_unet(sd, downsample=unet_downsample)


def state_tree(state) -> dict:
    """The checkpointed tree: params + optimizer state + step, so --resume
    continues bitwise (VERDICT r2 #4). Saved sharded as-is — Orbax gathers
    per-shard without a host round-trip."""
    return {"step": state.step, "params": state.params,
            "opt_state": state.opt_state}


def try_resume(ckpt, state, mesh=None):
    """Restore 'last' into the train state. -> (state, resumed: bool).

    Orbax returns committed (often single-device) arrays; re-place each leaf
    on its live counterpart's NamedSharding — scalars the fresh state left
    uncommitted (step, Adam count) are replicated over the mesh so the jitted
    step sees one consistent device set."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    if not os.path.isdir(os.path.join(ckpt.directory, "last")):
        return state, False
    target = state_tree(state)
    try:
        restored = ckpt.restore(target, "last")
    except Exception:
        # pre-rotation checkpoints stored bare params (no step/opt_state):
        # warm-start the params and let the optimizer/step start fresh
        params = ckpt.restore(state.params, "last")
        print("resume: 'last' holds a bare params tree (old format) — "
              "restored params only; optimizer state and step start fresh")
        restored = dict(target)
        restored["params"] = params

    def replace(ref, x):
        sh = getattr(ref, "sharding", None)
        if not isinstance(sh, NamedSharding) and mesh is not None:
            sh = NamedSharding(mesh, PartitionSpec())
        return jax.device_put(x, sh) if sh is not None else x

    restored = jax.tree_util.tree_map(replace, target, restored)
    state = state.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    return state, True
