#!/usr/bin/env python
"""Ensemble operating-point sweep over two or more trained checkpoints.

Ensembling is rebuild-only surface (the reference has no ensemble mode):
`build_ensemble_fn` pools every (member, scale, flip) variant's detections
into the same agreement-voting merge TTA uses, so cross-MODEL agreement is
rewarded exactly like cross-scale agreement.  The round-5 experiment this
was built for: merge the two committed flagships (hourglass + unet
`model_99`) and see whether model diversity buys quality beyond what
matched TTA already extracts from either alone.

Each member checkpoint is self-describing (architecture restored from its
stored Config, sweep_tta.py convention); the mask stage runs on
--mask_member (default: the last member — pass the strongest mask model
last).  Reports each member's single-scale baseline at every conf, then
the ensemble grid.

Usage:
  python benchmarks/sweep_ensemble.py \
      --weights runs/kg_hard1024/model_99,runs/kg_unet1024/model_99 \
      --dataset synthetic_hard --scales 0.75,1.0,1.25 --flip 1 \
      --conf 0.3,0.35 --vote max,mean --vote_thresh 0.15,0.2
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
    p.add_argument("--weights", required=True,
                   help="comma-separated checkpoint dirs (2+ members)")
    p.add_argument("--mask_member", type=int, default=-1,
                   help="member whose features feed the mask stage "
                        "(default: last)")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="")
    p.add_argument("--use_ema", type=int, default=1, choices=[0, 1])
    p.add_argument("--input_size", type=int, default=512)
    p.add_argument("--scales", default="1")
    p.add_argument("--flip", type=int, default=0, choices=[0, 1])
    p.add_argument("--conf", default="0.3,0.35")
    p.add_argument("--vote", default="max,mean")
    p.add_argument("--vote_thresh", default="0.15,0.2")
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
    from kgtpu.infer import build_ensemble_fn, build_infer_fn
    from kgtpu.models import KGNet, required_divisor

    paths = [w for w in args.weights.split(",") if w]
    assert len(paths) >= 2, "--weights needs at least two members"
    members = []
    for w in paths:
        params, extra = checkpoint.restore_bundle(w,
                                                  use_ema=bool(args.use_ema))
        stored = checkpoint.decode_config(extra)
        assert stored is not None, f"{w}: no self-describing Config"
        members.append((w, stored.model, params))
    mask_member = args.mask_member % len(members)

    c0 = Config()
    base = dataclasses.replace(
        c0,
        # cfg.model must be the mask member's ModelConfig (stage-2 crop
        # geometry contract, build_ensemble_fn docstring)
        model=members[mask_member][1],
        data=dataclasses.replace(c0.data, dataset=args.dataset,
                                 data_dir=args.data_dir,
                                 input_size=args.input_size),
        group=dataclasses.replace(c0.group, size_prune=args.size_prune),
        infer=dataclasses.replace(c0.infer, input_size=args.input_size))
    models = [KGNet(cfg=mc) for _, mc, _ in members]
    params_list = [pr for _, _, pr in members]
    divisor = max(required_divisor(mc) for _, mc, _ in members)
    if args.input_size % divisor:
        # same gate as test.py: the scale-1.0 stack would otherwise be
        # built at a rounded side != the paste/eval canvas, silently
        # shifting mask crops in a published-numbers sweep
        sys.exit(f"--input_size {args.input_size} must be divisible by "
                 f"{divisor} for the selected members")
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

    for conf in (float(x) for x in args.conf.split(",")):
        cfg1 = dataclasses.replace(
            base, group=dataclasses.replace(base.group, score_thresh=conf))
        for (w, mc, pr), m in zip(members, models):
            scfg = dataclasses.replace(cfg1, model=mc)
            t0 = time.time()
            out = build_infer_fn(KGNet(cfg=mc), scfg)(pr, stacks["1"])
            report(f"member[{os.path.basename(os.path.dirname(w)) or w}] "
                   f"single conf={conf:.2f}  ({time.time() - t0:.0f}s)", out)
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
                out = build_ensemble_fn(models, cfg2,
                                        mask_member=mask_member)(
                    params_list, stacks)
                report(f"ensemble conf={conf:.2f} vote={vote} vt={vt:g}  "
                       f"({time.time() - t0:.0f}s)", out)


if __name__ == "__main__":
    main()
