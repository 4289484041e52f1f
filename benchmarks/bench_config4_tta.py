#!/usr/bin/env python
"""BASELINE config 4: multi-scale test-time augmentation with cross-scale
NMS merge, batched on device (scales 0.75 / 1.0 / 1.25)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.infer import build_multiscale_fn
from kgtpu.models import KGNet
from kgtpu.train_lib import create_train_state


def main():
    scales = (0.75, 1.0, 1.25)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, test_scales=scales))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    ms = build_multiscale_fn(model, cfg)
    base = cfg.infer.input_size
    batch = int(os.environ.get("KGTPU_BENCH_BATCH", "8"))
    imgs = {f"{sc:g}": jnp.zeros((batch,) + (int(round(base * sc)),) * 2 + (3,),
                                 jnp.float32) for sc in scales}
    r = bench_fn(ms, state.params, imgs, iters=10)
    emit({"metric": "config4_tta3_img_per_sec",
          "value": round(batch * r["calls_per_sec"], 2), "unit": "img/s",
          "scales": list(scales), "batch": batch, "vs_baseline": None})


if __name__ == "__main__":
    main()
