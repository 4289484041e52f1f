#!/usr/bin/env python
"""BASELINE config 2: batch-8 train step (on-device gaussian targets +
focal/offset/mask losses, full fwd/bwd) jitted on one chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.common import bench_fn, device_peak, emit
from kgtpu import train_lib
from kgtpu.config import Config
from kgtpu.data import build_dataset, make_batch
from kgtpu.models import KGNet


def main():
    bs = int(os.environ.get("KGTPU_BENCH_BATCH", "8"))
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)

    ds = build_dataset(cfg.data)   # synthetic 512²
    batch = make_batch(ds, list(range(bs)), cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    def step(state, batch, rng):
        grad_fn = jax.value_and_grad(train_lib.loss_fn, has_aux=True)
        (_, (metrics, _stats)), grads = grad_fn(state.params, batch, rng,
                                                model, cfg)
        return state.apply_gradients(grads=grads), metrics

    # bench the step without donation (bench_fn re-uses inputs)
    fn = lambda s, b, k: step(s, b, k)[1]
    # train MFU / roofline position (VERDICT r2 item 3): FLOPs of the exact
    # fwd+bwd+update program vs the bf16 peak, and the HBM-bandwidth bound
    # (cost analysis from the SAME compiled program — no second XLA compile)
    r = bench_fn(fn, state, batch, rng, iters=10, warmup=2, with_cost=True)
    flops, nbytes = r["flops"], r["bytes"]
    peak_fl, peak_bw = device_peak()
    img_s = bs * r["calls_per_sec"]
    mfu = (flops / bs) * img_s / peak_fl if peak_fl else None
    # time the program would take if purely HBM-bound at spec bandwidth
    bw_bound_ms = 1000 * nbytes / peak_bw if peak_bw else None
    emit({"metric": f"config2_train_step_batch{bs}_img_per_sec",
          "value": round(img_s, 2), "unit": "img/s",
          "ms_per_step": round(1000 * r["sec_per_call"], 1),
          "gflops_per_img": round(flops / bs / 1e9, 2),
          "train_mfu": round(mfu, 4) if mfu is not None else None,
          "hbm_gb_per_step": round(nbytes / 1e9, 2),
          "hbm_bound_ms_per_step": (round(bw_bound_ms, 1)
                                    if bw_bound_ms is not None else None),
          "vs_baseline": None})


if __name__ == "__main__":
    main()
