#!/usr/bin/env python
"""BASELINE config 2: batch-8 train step (on-device gaussian targets +
focal/offset/mask losses, full fwd/bwd) jitted on one chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.common import bench_fn, emit
from kgtpu import train_lib
from kgtpu.config import Config
from kgtpu.data import build_dataset, make_batch
from kgtpu.models import KGNet


def main():
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)

    ds = build_dataset(cfg.data)   # synthetic 512²
    batch = make_batch(ds, list(range(8)), cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    def step(state, batch, rng):
        grad_fn = jax.value_and_grad(train_lib.loss_fn, has_aux=True)
        (_, (metrics, _stats)), grads = grad_fn(state.params, batch, rng,
                                                model, cfg)
        return state.apply_gradients(grads=grads), metrics

    # bench the step without donation (bench_fn re-uses inputs)
    r = bench_fn(lambda s, b, k: step(s, b, k)[1], state, batch, rng,
                 iters=10, warmup=2)
    emit({"metric": "config2_train_step_batch8_img_per_sec",
          "value": round(8 * r["calls_per_sec"], 2), "unit": "img/s",
          "ms_per_step": round(1000 * r["sec_per_call"], 1),
          "vs_baseline": None})


if __name__ == "__main__":
    main()
