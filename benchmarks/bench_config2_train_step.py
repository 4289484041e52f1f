#!/usr/bin/env python
"""BASELINE config 2: batch-8 train step (on-device gaussian targets +
focal/offset/mask losses, full fwd/bwd) jitted on one chip.

KGTPU_BENCH_K > 1 benches the SCANNED k-steps-per-dispatch program
(train_lib.make_train_multi_step's body) pipelined, reporting per-step
device time with the host dispatch constant amortized k-fold.  This is
the overhead-split instrument for the round-3 roofline's open question:
batch 8 sat at 20-25% of its HBM bound with ~20 ms of fixed per-step
overhead — comparing k=1 vs k=8 per-step ms against the HBM floor says
how much of that overhead is the (tunnel) dispatch constant vs real
unfused device work."""

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
    k = int(os.environ.get("KGTPU_BENCH_K", "1"))
    cfg = Config()
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)

    ds = build_dataset(cfg.data)   # synthetic 512²
    nprng = np.random.default_rng(0)
    batch = make_batch(ds, list(range(bs)), cfg.data, augment=False,
                       rng=nprng)
    batch = {k_: jax.device_put(v) for k_, v in batch.items()}

    if k > 1:
        # the shipping scanned program (make_train_multi_step's body),
        # re-wrapped without donation so bench_fn can re-use its inputs
        from kgtpu.train_lib import _train_step_body

        stacked = {k_: jax.device_put(np.stack([np.asarray(v)] * k))
                   for k_, v in batch.items()}
        offs = jax.device_put(np.arange(k, dtype=np.int32))

        def fn(s, b, r_, o):
            def body(st, xs):
                bb, off = xs
                return _train_step_body(st, bb, jax.random.fold_in(r_, off),
                                        model, cfg)
            _, ms = jax.lax.scan(body, s, (b, o), length=k)
            return ms

        args = (state, stacked, rng, offs)
    else:
        def step(state, batch, rng):
            grad_fn = jax.value_and_grad(train_lib.loss_fn, has_aux=True)
            (_, (metrics, _stats)), grads = grad_fn(state.params, batch, rng,
                                                    model, cfg)
            return state.apply_gradients(grads=grads), metrics

        # bench the step without donation (bench_fn re-uses inputs)
        fn = lambda s, b, r_: step(s, b, r_)[1]
        args = (state, batch, rng)

    # train MFU / roofline position (VERDICT r2 item 3): FLOPs of the exact
    # fwd+bwd+update program vs the bf16 peak, and the HBM-bandwidth bound
    # (cost analysis from the SAME compiled program — no second XLA compile)
    r = bench_fn(fn, *args, iters=10, warmup=2, with_cost=True)
    # XLA's cost analysis counts a While (lax.scan) BODY ONCE regardless of
    # trip count (verified on jax 0.9.0: 532,479 flops at k=1 vs 532,488 at
    # k=8 for an identical scanned body), so the scanned program's reported
    # flops/bytes already ARE ~one step's — do NOT divide by k
    flops, nbytes = r["flops"], r["bytes"]              # per optimizer step
    peak_fl, peak_bw = device_peak()
    img_s = bs * k * r["calls_per_sec"]
    mfu = (flops / bs) * img_s / peak_fl if peak_fl else None
    # time the program would take if purely HBM-bound at spec bandwidth
    bw_bound_ms = 1000 * nbytes / peak_bw if peak_bw else None
    emit({"metric": f"config2_train_step_batch{bs}_img_per_sec"
                    + (f"_k{k}" if k > 1 else ""),
          "value": round(img_s, 2), "unit": "img/s",
          "ms_per_step": round(1000 * r["sec_per_call"] / k, 1),
          "gflops_per_img": round(flops / bs / 1e9, 2),
          "train_mfu": round(mfu, 4) if mfu is not None else None,
          "hbm_gb_per_step": round(nbytes / 1e9, 2),
          "hbm_bound_ms_per_step": (round(bw_bound_ms, 1)
                                    if bw_bound_ms is not None else None),
          "vs_baseline": None})


if __name__ == "__main__":
    main()
