"""demo_refocus.py — 3D refocus (depth-of-field) augmentation CLI, parity
with the reference (omnidata_tools/torch/demo_refocus.py:1-81).

    python demo_refocus.py --input_path <dir with *_rgb.png + *_depth_euclidean.png> \
        --output_path <dir> [--num_quantiles 10 --min_aperture 0.001 --max_aperture 6]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Visualize 3D refocus augmentation")
    p.add_argument("--num_quantiles", type=int, default=10)
    p.add_argument("--min_aperture", type=float, default=0.001)
    p.add_argument("--max_aperture", type=float, default=6.0)
    p.add_argument("--input_path", required=True,
                   help="folder containing rgb and depth_euclidean images")
    p.add_argument("--output_path", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from omnidata_tpu.augment import refocus_augmentation
    from omnidata_tpu.data.transforms import get_transform

    os.makedirs(args.output_path, exist_ok=True)
    t_rgb = get_transform("rgb", image_size=512)
    t_depth = get_transform("depth_euclidean", image_size=512)

    input_path = Path(args.input_path)
    if not input_path.is_dir():
        print("invalid file path!")
        sys.exit(1)

    key = jax.random.PRNGKey(args.seed)
    for f in sorted(glob.glob(args.input_path + "/*")):
        name = os.path.splitext(os.path.basename(f))[0]
        if "rgb" not in name:
            continue
        base = os.path.basename(f).replace("rgb", "depth_euclidean")
        depth_path = os.path.join(os.path.dirname(f), base)
        if not os.path.exists(depth_path):
            continue
        print(f"Reading input {f} ...")
        rgb = t_rgb(Image.open(f))[:3][None]
        depth = t_depth(Image.open(depth_path))[:1][None]
        # depth_euclidean transform rescales by 8000/65535; refocus wants
        # strictly positive depths
        depth = np.maximum(depth, 1e-3)
        key, k = jax.random.split(key)
        out = refocus_augmentation(
            jnp.asarray(rgb), jnp.asarray(depth), k,
            n_quantiles=args.num_quantiles,
            aperture_min=args.min_aperture, aperture_max=args.max_aperture,
        )
        save_path = os.path.join(args.output_path, f"{name}_refocused.png")
        arr = (np.clip(np.asarray(out[0]), 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(save_path)
        print(f"Writing output {save_path} ...")


if __name__ == "__main__":
    main()
