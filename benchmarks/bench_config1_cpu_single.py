#!/usr/bin/env python
"""BASELINE config 1: single 512×512 cell image, full pipeline (backbone fwd
+ heatmap decode + keypoint-graph box assembly), CPU float32."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.infer import build_detect_fn
from kgtpu.models import KGNet
from kgtpu.train_lib import create_train_state


def main():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="float32"))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    detect = build_detect_fn(model, cfg)
    img = jnp.zeros((1, 512, 512, 3), jnp.float32)
    r = bench_fn(detect, state.params, img, iters=3, warmup=1)
    emit({"metric": "config1_cpu_single_512_detect_ms",
          "value": round(1000 * r["sec_per_call"], 2), "unit": "ms/img",
          "vs_baseline": None})


if __name__ == "__main__":
    main()
