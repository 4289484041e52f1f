#!/usr/bin/env python
"""Evaluation CLI — mask AP from test.py outputs.  [SURVEY.md C17]

Compares <pred_dir>/<id>_label.png + <id>.json against dataset ground truth,
resized to the same canvas the predictions were made on.

Example:
  python eval.py --pred_dir /tmp/results --dataset synthetic
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from kgtpu.config import Config, build_eval_parser
    import dataclasses

    import cv2
    import numpy as np

    from kgtpu import evaluate
    from kgtpu.data import build_dataset
    from kgtpu.data.transforms import resize_sample

    if os.environ.get("KGTPU_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["KGTPU_PLATFORM"])

    from kgtpu.utils import enable_compilation_cache
    enable_compilation_cache()

    args = build_eval_parser().parse_args()
    if args.dataset == "folder":
        raise SystemExit("--dataset folder has no ground truth; every "
                         "metric would be vacuous — evaluate against "
                         "dsb2018/neural_cells/coco/synthetic* instead")

    with open(os.path.join(args.pred_dir, "detections.json")) as f:
        summary = json.load(f)
    input_size = summary["input_size"]

    dcfg = dataclasses.replace(
        Config().data, dataset=args.dataset,
        data_dir=args.gt_dir, input_size=input_size)
    ds = build_dataset(dcfg, split="test")
    gt_by_id = {}
    for i in range(len(ds)):
        raw = ds[i]
        gt_by_id[raw.get("id", f"img_{i:05d}")] = raw

    recs = []
    for rec in summary["images"]:
        iid = rec["id"]
        if iid not in gt_by_id:
            continue
        pred = cv2.imread(os.path.join(args.pred_dir, f"{iid}_label.png"),
                          cv2.IMREAD_UNCHANGED).astype(np.int32)
        gt = resize_sample(gt_by_id[iid], input_size)["label_map"]
        # scores indexed by label id - 1
        d = max(int(pred.max()), len(rec["scores"]))
        scores = np.zeros(max(d, 1), np.float32)
        # test.py writes scores only for valid dets; valid dets are slots 0..k
        for k, s in enumerate(rec["scores"]):
            scores[k] = s
        recs.append({"pred_label": pred, "scores": scores, "gt_label": gt})

    out = {}
    if args.protocol in ("dsb2018", "all"):
        out["mAP_dsb2018"] = evaluate.evaluate_dsb2018(recs)["mAP_dsb2018"]
    if args.protocol in ("coco", "all"):
        out.update(evaluate.evaluate_coco(recs))
    if args.protocol in ("aji", "all"):
        out["AJI"] = evaluate.evaluate_aji(recs)["AJI"]
    if args.protocol in ("pq", "all"):
        out.update({k: v for k, v in evaluate.evaluate_pq(recs).items()
                    if k in ("PQ", "SQ", "RQ")})
    print(json.dumps({**out, "num_images": len(recs)}))


if __name__ == "__main__":
    main()
