"""eval_depth.py — depth evaluation driver (reference: paper_code/test_depth.py;
metrics from evaluation_metrics.py:13-110: L1/MSE x100, log10, si-log,
relative error, irmse).

    python eval_depth.py --data_path <annotated dir> [--checkpoint ckpt.ckpt]
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", default=None)
    p.add_argument("--nyu_root", default=None,
                   help="NYU .h5 directory (rgb+depth) — external protocol")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--image_size", type=int, default=384)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--align", choices=("none", "ssi"), default="none",
                   help="'ssi': per-image least-squares scale/shift "
                        "alignment of pred to gt before metrics — the MiDaS "
                        "protocol for models trained with the "
                        "scale-shift-invariant stage of the loss "
                        "(midas_loss.py:10-30; absolute metrics are "
                        "meaningless for an SSI-stage model)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from omnidata_tpu.data.dataset import OmnidataDataset, Options
    from omnidata_tpu.models import create_model
    from omnidata_tpu.train.metrics import depth_metrics

    bundle = create_model("depth_dpt_hybrid_384", checkpoint=args.checkpoint)

    if args.nyu_root:
        from omnidata_tpu.data.external_eval import NYUDepthDataset, _resize_chw

        ds = NYUDepthDataset(args.nyu_root)
        agg: dict = {}
        n = 0
        limit = args.max_batches * args.batch_size or len(ds)
        for i in range(min(limit, len(ds))):
            import numpy as np

            s = ds[i]
            x = _resize_chw(s["rgb"], args.image_size, args.image_size)
            x = (x - 0.5) / 0.5  # depth model takes [-1,1] rgb
            pred = bundle.apply(bundle.variables, jnp.asarray(x[None]))
            h, w = s["orig_size"]
            pred = np.clip(_resize_chw(np.asarray(pred), h, w)[0], 0, 1)
            # model outputs [0,1] inverse-ish depth; evaluate vs gt scaled to
            # [0,1] by NYU's max range (the reference's clamp_to convention;
            # pred clipped the same as the --data_path protocol)
            gt = np.clip(s["depth"][0] / ds.MAX_DEPTH, 0, 1)
            m = jnp.asarray(s["mask"][0] > 0.5)
            out = depth_metrics(jnp.asarray(pred)[None, None],
                                jnp.asarray(gt)[None, None],
                                m[None, None])
            for k, v in out.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            raise SystemExit("no NYU samples found")
        print(json.dumps({k: v / n for k, v in agg.items()}, indent=2))
        return

    if not args.data_path:
        raise SystemExit("one of --data_path / --nyu_root required")
    ds = OmnidataDataset(
        Options(
            data_path=args.data_path,
            tasks=("rgb", "depth_zbuffer", "mask_valid"),
            image_size=args.image_size,
            random_flip=False,
        )
    )
    agg: dict = {}
    n = 0
    for i, batch in enumerate(ds.batches(args.batch_size, shuffle=False, drop_last=False)):
        if args.max_batches and i >= args.max_batches:
            break
        rgb = jnp.asarray(batch["rgb"], jnp.float32) * 2.0 - 1.0
        pred = jnp.clip(bundle.apply(bundle.variables, rgb), 0.0, 1.0)[:, None]
        target = jnp.asarray(batch["depth_zbuffer"], jnp.float32)
        mask = jnp.asarray(batch["mask_valid"] > 0.5)
        if args.align == "ssi":
            from omnidata_tpu.losses.midas import compute_scale_and_shift

            s, t = compute_scale_and_shift(pred[:, 0], target[:, 0],
                                           mask[:, 0])
            pred = jnp.clip(s[:, None, None, None] * pred
                            + t[:, None, None, None], 0.0, 1.0)
        m = depth_metrics(pred, target, mask)
        B = int(batch["rgb"].shape[0])  # partial tail batch: weight by size
        for k, v in m.items():
            agg[k] = agg.get(k, 0.0) + v * B
        n += B
    if n == 0:
        raise SystemExit("no complete (rgb, depth_zbuffer, mask_valid) samples found")
    result = {k: v / n for k, v in agg.items()}
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
