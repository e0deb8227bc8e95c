"""eval_normal.py — surface-normal evaluation driver (reference:
paper_code/test_normal.py + oasis_eval; metrics from evaluation_metrics.py).

    python eval_normal.py --data_path <annotated dir> \
        [--checkpoint ckpt.ckpt --model dpt|unet --image_size 384]

Reports mean/median angular error, % within 11.25/22.5/30 degrees, masked
L1/MSE x100 — the OASIS table's metric suite (docs/pretrained.html:56-117).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default=None,
                   help="annotator-layout directory (self-annotated eval)")
    p.add_argument("--oasis_csv", default=None,
                   help="OASIS_val.csv for the external-benchmark protocol")
    p.add_argument("--oasis_root", default="",
                   help="prefix joined onto the csv's relative paths")
    p.add_argument("--nyu_root", default=None,
                   help="NYU .h5 directory with normals_gt companions")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model", default="dpt", choices=["dpt", "unet"])
    p.add_argument("--image_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--tta", action="store_true",
                   help="flip TTA with median merge (oasis_eval_tta.py)")
    args = p.parse_args(argv)

    if args.oasis_csv or args.nyu_root:
        from omnidata_tpu.data.external_eval import (
            NYUNormalDataset,
            OASISNormalDatasetVal,
            evaluate_normals,
            make_oasis_model_fn,
        )
        from omnidata_tpu.models import create_model

        name = ("surface_normal_dpt_hybrid_384" if args.model == "dpt"
                else "surface_normal_unet")
        bundle = create_model(name, checkpoint=args.checkpoint)
        if args.oasis_csv:
            ds = OASISNormalDatasetVal(args.oasis_csv, root=args.oasis_root)
        else:
            ds = NYUNormalDataset(args.nyu_root)
        model_fn = make_oasis_model_fn(bundle.apply, bundle.variables)
        if args.tta:
            from omnidata_tpu.models.tta import SurfaceNormalsTTA

            model_fn = SurfaceNormalsTTA(model_fn)
        result = evaluate_normals(
            model_fn, ds,
            max_items=args.max_batches * args.batch_size or None,
            fixed_input_size=(args.image_size, args.image_size),
        )
        print(json.dumps(result, indent=2))
        return

    if not args.data_path:
        raise SystemExit("one of --data_path / --oasis_csv / --nyu_root required")

    import jax.numpy as jnp
    import numpy as np

    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.models import create_model
    from omnidata_tpu.train.metrics import normal_metrics

    name = "surface_normal_dpt_hybrid_384" if args.model == "dpt" else "surface_normal_unet"
    bundle = create_model(name, checkpoint=args.checkpoint)

    ds = OmnidataDataset(
        Options(
            data_path=args.data_path,
            tasks=("rgb", "normal", "mask_valid"),
            image_size=args.image_size,
            random_flip=False,
        )
    )
    agg: dict = {}
    n = 0
    for i, batch in enumerate(ds.batches(args.batch_size, shuffle=False, drop_last=False)):
        if args.max_batches and i >= args.max_batches:
            break
        pred = bundle.apply(bundle.variables, jnp.asarray(batch["rgb"], jnp.float32))
        pred = jnp.clip(pred, 0.0, 1.0) * 2.0 - 1.0  # [0,1] -> [-1,1]
        target = jnp.asarray(batch["normal"], jnp.float32) * 2.0 - 1.0
        mask = jnp.asarray(batch["mask_valid"] > 0.5)
        m = normal_metrics(pred, target, mask)
        B = int(batch["rgb"].shape[0])  # partial tail batch: weight by size
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + v * B
        n += B
    if n == 0:
        raise SystemExit("no complete (rgb, normal, mask_valid) samples found")
    result = {k: v / n for k, v in agg.items()}
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
