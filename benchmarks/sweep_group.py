#!/usr/bin/env python
"""Grouper operating-point sweep on a trained checkpoint.

Loads a checkpoint ONCE, then evaluates a grid of test-time grouper settings
(`--conf_thresh` × `--size_prune`) fully in-process — each setting is one
re-jit of the inference program (~15 s on the v5e after the first compile)
instead of a full test.py + eval.py round trip.  This is how the round-2
crowded operating point (conf 0.3, size_prune 1.5 → mAP 0.851 with no
dataset prior) was found.

Usage:
  python benchmarks/sweep_group.py --weights /tmp/kg_crowd3 \
      --dataset synthetic_crowded --conf 0.15,0.25,0.3,0.35 --sp 1.5,2,3
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="")
    p.add_argument("--use_ema", type=int, default=1, choices=[0, 1])
    p.add_argument("--conf", default="0.15,0.25,0.3,0.35")
    p.add_argument("--sp", default="1.5,2,3",
                   help="size_prune values (0 disables the wh gate)")
    p.add_argument("--rescore", default="0",
                   help="mask_rescore weights to sweep (0 = off; each value "
                        "is one more re-jit per (conf, sp) point)")
    # model-config overrides — the architecture normally comes from the
    # self-describing checkpoint (C18); these apply only when explicitly
    # passed (or for pre-config legacy checkpoints, where they must match
    # how the checkpoint was trained)
    p.add_argument("--roi_size", type=int, default=32)
    p.add_argument("--inter_inject", action="store_true")
    p.add_argument("--wh_head", type=int, default=1, choices=[0, 1])
    p.add_argument("--decode", default="kg", choices=["kg", "centernet"],
                   help="box assembly to sweep (the centernet baseline "
                        "reuses the same checkpoint's wh head)")
    args = p.parse_args()

    import jax
    import numpy as np
    import jax.numpy as jnp

    if os.environ.get("KGTPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KGTPU_PLATFORM"])

    from kgtpu import checkpoint, evaluate
    from kgtpu.config import Config, explicit_cli_dests
    from kgtpu.data import build_dataset
    from kgtpu.data.loader import _prepare_sample
    from kgtpu.infer import build_infer_fn
    from kgtpu.models import KGNet

    params, extra = checkpoint.restore_bundle(args.weights,
                                              use_ema=bool(args.use_ema))
    stored = checkpoint.decode_config(extra)
    explicit = explicit_cli_dests(p)
    c0 = Config()
    m = stored.model if stored is not None else c0.model
    kw = {}
    if stored is None or "roi_size" in explicit:
        kw.update(roi_size=args.roi_size, mask_size=2 * args.roi_size)
    if stored is None or "inter_inject" in explicit:
        kw["inter_inject"] = args.inter_inject
    if stored is None or "wh_head" in explicit:
        kw["use_wh_head"] = bool(args.wh_head)
    if args.decode == "centernet":
        kw["use_wh_head"] = True    # centernet assembly needs the wh head
    base = dataclasses.replace(
        c0,
        model=dataclasses.replace(m, **kw),
        data=dataclasses.replace(c0.data, dataset=args.dataset,
                                 data_dir=args.data_dir),
        group=dataclasses.replace(c0.group, method=args.decode))
    ds = build_dataset(base.data, split="test")
    rng = np.random.default_rng(0)
    samples = [_prepare_sample(ds[i], base.data, augment=False, rng=rng)
               for i in range(len(ds))]
    imgs = jnp.asarray(np.stack([s["image"] for s in samples]))
    model = KGNet(cfg=base.model)

    grid = [(conf, sp, w)
            for conf in (float(x) for x in args.conf.split(","))
            for sp in (float(x) for x in args.sp.split(","))
            for w in (float(x) for x in args.rescore.split(","))]
    for conf, sp, w in grid:
            cfg = dataclasses.replace(
                base,
                group=dataclasses.replace(
                    base.group, score_thresh=conf, size_prune=sp),
                infer=dataclasses.replace(base.infer, mask_rescore=w))
            infer = build_infer_fn(model, cfg)
            t0 = time.time()
            o = infer(params, imgs)
            labs = np.asarray(o["label_map"])
            scs = np.asarray(o["scores"])
            vals = np.asarray(o["valid"])
            recs = [{"pred_label": labs[i],
                     "scores": np.where(vals[i], scs[i], 0.0),
                     "gt_label": s["label_map"]}
                    for i, s in enumerate(samples)]
            r = evaluate.evaluate_dsb2018(recs)
            rc = evaluate.evaluate_coco(recs)
            aji = evaluate.evaluate_aji(recs)["AJI"]
            pq = evaluate.evaluate_pq(recs)["PQ"]
            tag = f" rescore={w:g}" if w else ""
            print(f"conf={conf:.2f} sp={sp:g}{tag}: "
                  f"mAP={r['mAP_dsb2018']:.3f} AP={rc['AP_coco']:.3f} "
                  f"AP50={rc['AP50']:.3f} AP75={rc['AP75']:.3f} "
                  f"AJI={aji:.3f} PQ={pq:.3f} "
                  f"dets/img={vals.sum() / len(samples):.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
