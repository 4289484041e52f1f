#!/usr/bin/env python
"""BASELINE config 3: two-stage inference (keypoint-graph boxes → fixed-count
ROI crop → per-box mask head) on DSB2018 nuclei, or synthetic images with the
same shape profile when no --data_dir is given."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.data import build_dataset
from kgtpu.data.loader import _prepare_sample
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet
from kgtpu.train_lib import create_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    cfg = Config()
    if args.data_dir:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset="dsb2018",
                                          data_dir=args.data_dir))
    ds = build_dataset(cfg.data, split="test")
    rng = np.random.default_rng(0)
    imgs = np.stack([
        _prepare_sample(ds[i % len(ds)], cfg.data, augment=False,
                        rng=rng)["image"]
        for i in range(args.batch)])

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    infer = build_infer_fn(model, cfg)
    r = bench_fn(infer, state.params, jnp.asarray(imgs), iters=10)
    emit({"metric": "config3_two_stage_img_per_sec",
          "value": round(args.batch * r["calls_per_sec"], 2), "unit": "img/s",
          "dataset": cfg.data.dataset, "batch": args.batch,
          "vs_baseline": None})


if __name__ == "__main__":
    main()
