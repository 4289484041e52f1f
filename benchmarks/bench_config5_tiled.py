#!/usr/bin/env python
"""BASELINE config 5 (stretch): whole-slide sliding-window inference with
on-device tile stitching — one jitted call per 2048² slide."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.infer import build_tiled_infer_fn
from kgtpu.models import KGNet
from kgtpu.train_lib import create_train_state


def main():
    side = int(os.environ.get("KGTPU_SLIDE_SIDE", "2048"))
    cfg = Config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    tiled = build_tiled_infer_fn(model, cfg, (side, side))
    img = jnp.zeros((side, side, 3), jnp.float32)
    r = bench_fn(tiled, state.params, img, iters=5)
    from kgtpu.ops.tiling import tile_grid
    t = len(tile_grid(side, side, cfg.infer.tile_size, cfg.infer.tile_overlap))
    emit({"metric": "config5_whole_slide_sec_per_slide",
          "value": round(r["sec_per_call"], 3), "unit": f"s/{side}^2-slide",
          "tiles": t,
          "tiles_per_sec": round(t * r["calls_per_sec"], 1),
          "vs_baseline": None})


if __name__ == "__main__":
    main()
