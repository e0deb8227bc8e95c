"""demo.py — public inference CLI, parity with the reference
(omnidata_tools/torch/demo.py:23-163).

    python demo.py --task normal --img_path <img-or-dir> --output_path <dir> \
        [--checkpoint pretrained_models/omnidata_dpt_normal_v2.ckpt]

Pre/post-processing matches the reference exactly:
- both tasks: resize shorter side to 384 (bilinear) -> center crop 384
- normal: to [0,1]; depth: additionally normalize to [-1,1] (mean/std 0.5)
- outputs clamped to [0,1]; depth bicubic-upsampled to 512, inverted (1-d),
  saved with the viridis colormap; normal saved as an RGB PNG
- also writes <name>_rgb.png (512 center crop) next to the predictions

Checkpoints: pass the published torch .ckpt paths — they are converted to
Flax on load (models/convert.py). Without a checkpoint, random weights are
used (useful only for smoke tests).
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Visualize output for depth or surface normals")
    p.add_argument("--task", dest="task", help="normal or depth", default="NONE")
    p.add_argument("--img_path", dest="img_path", help="path to rgb image")
    p.add_argument("--output_path", dest="output_path", help="path to where output image should be stored")
    p.add_argument("--checkpoint", default=None, help="torch checkpoint to convert+load")
    p.add_argument("--image_size", type=int, default=384)
    return p


def preprocess(img, image_size: int, task: str) -> np.ndarray:
    """PIL -> (1,3,S,S) float32 with the reference's transform chain."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    if w < h:
        img = img.resize((image_size, int(round(h * image_size / w))), Image.BILINEAR)
    else:
        img = img.resize((int(round(w * image_size / h)), image_size), Image.BILINEAR)
    w, h = img.size
    left, top = (w - image_size) // 2, (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    x = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
    if task == "depth":
        x = (x - 0.5) / 0.5
    return x[None]


def center_crop_512(img):
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    s = 512
    if w < h:
        img = img.resize((s, int(round(h * s / w))), Image.BILINEAR)
    else:
        img = img.resize((int(round(w * s / h)), s), Image.BILINEAR)
    w, h = img.size
    left, top = (w - s) // 2, (h - s) // 2
    return img.crop((left, top, left + s, top + s))


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.task not in ("normal", "depth"):
        print("task should be one of the following: normal, depth")
        sys.exit(1)

    import jax.numpy as jnp
    from PIL import Image

    from omnidata_tpu.models import create_model
    from omnidata_tpu.models.layers import resize_bicubic

    os.makedirs(args.output_path, exist_ok=True)
    name = (
        "surface_normal_dpt_hybrid_384" if args.task == "normal" else "depth_dpt_hybrid_384"
    )
    bundle = create_model(name, checkpoint=args.checkpoint)

    def save_outputs(img_path, output_file_name):
        save_path = os.path.join(args.output_path, f"{output_file_name}_{args.task}.png")
        print(f"Reading input {img_path} ...")
        img = Image.open(img_path)
        x = preprocess(img, args.image_size, args.task)

        center_crop_512(img).save(
            os.path.join(args.output_path, f"{output_file_name}_rgb.png")
        )

        out = bundle.apply(bundle.variables, jnp.asarray(x))
        out = jnp.clip(out, 0.0, 1.0)

        if args.task == "depth":
            d = out[0][..., None]  # (H,W,1)
            d = resize_bicubic(d[None], (512, 512))[0, ..., 0]
            d = jnp.clip(d, 0.0, 1.0)
            d = 1.0 - d
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imsave(save_path, np.asarray(d), cmap="viridis")
        else:
            rgb = (np.asarray(out[0]).transpose(1, 2, 0) * 255).astype(np.uint8)
            Image.fromarray(rgb).save(save_path)
        print(f"Writing output {save_path} ...")

    from pathlib import Path

    img_path = Path(args.img_path)
    if img_path.is_file():
        save_outputs(args.img_path, os.path.splitext(os.path.basename(args.img_path))[0])
    elif img_path.is_dir():
        for f in sorted(glob.glob(args.img_path + "/*")):
            save_outputs(f, os.path.splitext(os.path.basename(f))[0])
    else:
        print("invalid file path!")
        sys.exit(1)


if __name__ == "__main__":
    main()
