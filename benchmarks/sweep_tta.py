#!/usr/bin/env python
"""TTA operating-point sweep on a trained checkpoint.  [VERDICT r2 item 2]

Round 2 shipped a TTA mode that *lowered* the FP-punishing DSB mAP
(max-merge can only add per-variant ghosts).  This tool finds the
operating point where TTA beats single-scale on BOTH protocols: it loads a
checkpoint once (self-describing — no architecture flags needed), reports
the single-scale baseline, then evaluates a grid of
(tta_vote, tta_vote_thresh, conf_thresh) over the requested scales/flip.

Usage:
  python benchmarks/sweep_tta.py --weights /tmp/kg_hard \
      --dataset synthetic_hard --scales 0.75,1.0,1.25 --flip 1 \
      --conf 0.15,0.3 --vote max,mean --vote_thresh 0,0.2,0.3
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
    p.add_argument("--input_size", type=int, default=512)
    p.add_argument("--scales", default="0.75,1.0,1.25")
    p.add_argument("--flip", type=int, default=1, choices=[0, 1])
    p.add_argument("--conf", default="0.15,0.3")
    p.add_argument("--vote", default="max,mean")
    p.add_argument("--vote_thresh", default="0,0.2,0.3")
    p.add_argument("--size_prune", type=float, default=3.0)
    p.add_argument("--n_images", type=int, default=16)
    args = p.parse_args()

    import jax
    import numpy as np

    if os.environ.get("KGTPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KGTPU_PLATFORM"])

    from kgtpu import checkpoint, evaluate
    from kgtpu.config import Config
    from kgtpu.data import build_dataset
    from kgtpu.data.loader import _prepare_sample
    from kgtpu.infer import build_infer_fn, build_multiscale_fn
    from kgtpu.models import KGNet, required_divisor

    params, extra = checkpoint.restore_bundle(args.weights,
                                              use_ema=bool(args.use_ema))
    stored = checkpoint.decode_config(extra)
    c0 = Config()
    base = dataclasses.replace(
        c0,
        model=stored.model if stored is not None else c0.model,
        data=dataclasses.replace(c0.data, dataset=args.dataset,
                                 data_dir=args.data_dir,
                                 input_size=args.input_size),
        group=dataclasses.replace(c0.group, size_prune=args.size_prune),
        infer=dataclasses.replace(c0.infer, input_size=args.input_size))
    model = KGNet(cfg=base.model)
    divisor = required_divisor(base.model)
    scales = tuple(float(x) for x in args.scales.split(","))
    assert 1.0 in scales, "--scales must include 1.0"

    ds = build_dataset(base.data, split="test")
    n = min(args.n_images, len(ds))
    rng = np.random.default_rng(0)
    raws = [ds[i] for i in range(n)]
    gts = [_prepare_sample(r, base.data, augment=False, rng=rng)["label_map"]
           for r in raws]
    stacks = {}
    for sc in scales:
        side = max(round(args.input_size * sc / divisor), 1) * divisor
        dcfg = dataclasses.replace(base.data, input_size=side)
        stacks[f"{sc:g}"] = np.stack([
            _prepare_sample(r, dcfg, augment=False, rng=rng,
                            image_only=True)["image"] for r in raws])

    def report(tag, out):
        recs = [{"pred_label": np.asarray(out["label_map"][i]),
                 "scores": np.asarray(out["scores"][i]),
                 "gt_label": gts[i]} for i in range(n)]
        r = evaluate.evaluate_dsb2018(recs)
        rc = evaluate.evaluate_coco(recs)
        aji = evaluate.evaluate_aji(recs)["AJI"]
        pq = evaluate.evaluate_pq(recs)["PQ"]
        dets = np.asarray(out["valid"]).sum() / n
        print(f"{tag}: mAP={r['mAP_dsb2018']:.3f} AP={rc['AP_coco']:.3f} "
              f"AP50={rc['AP50']:.3f} AP75={rc['AP75']:.3f} "
              f"AJI={aji:.3f} PQ={pq:.3f} "
              f"dets/img={dets:.1f}", flush=True)
        return r["mAP_dsb2018"], rc["AP_coco"]

    for conf in (float(x) for x in args.conf.split(",")):
        cfg1 = dataclasses.replace(
            base, group=dataclasses.replace(base.group, score_thresh=conf))
        t0 = time.time()
        out = build_infer_fn(model, cfg1)(params, stacks["1"])
        report(f"single conf={conf:.2f}  ({time.time() - t0:.0f}s)", out)
        for vote in args.vote.split(","):
            vts = ([0.0] if vote == "max"
                   else [float(x) for x in args.vote_thresh.split(",")])
            for vt in vts:
                cfg2 = dataclasses.replace(
                    cfg1, infer=dataclasses.replace(
                        cfg1.infer, test_scales=scales,
                        test_flip=bool(args.flip), tta_vote=vote,
                        tta_vote_thresh=vt))
                t0 = time.time()
                out = build_multiscale_fn(model, cfg2)(params, stacks)
                report(f"tta conf={conf:.2f} vote={vote} vt={vt:g}  "
                       f"({time.time() - t0:.0f}s)", out)


if __name__ == "__main__":
    main()
