#!/usr/bin/env python
"""BASELINE config 2: batch-8 train step (on-device gaussian targets +
focal/offset/mask losses, full fwd/bwd + optimizer/EMA update) jitted on
one chip.

The benched program is `train_lib._train_step_body` — the SHIPPING step —
returning (new_state, metrics) so bench_fn's output reduction keeps every
computation alive.  ROUND-4 CORRECTION: earlier rounds benched
`step(...)[1]` (metrics only, no grad_norm); XLA dead-code-eliminated the
ENTIRE backward pass + optimizer update from that program (verified:
85.7 GF metrics-only == forward-only vs 254.3 GF full step at 128²), so
every previously published config-2 number was a forward-only
measurement.  The round-3 train table in BASELINE.md is superseded by the
round-4 one.

KGTPU_BENCH_K > 1 benches the SCANNED k-steps-per-dispatch program
(train_lib.make_train_multi_step's body) pipelined, reporting per-step
device time with the host dispatch constant amortized k-fold — the
overhead-split instrument: comparing k=1 vs k=8 per-step ms against the
HBM floor says how much of the fixed per-step overhead is the (tunnel)
dispatch constant vs real unfused device work."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.common import bench_fn, cost_analysis, device_peak, emit
from kgtpu import train_lib
from kgtpu.config import Config
from kgtpu.data import build_dataset, make_batch
from kgtpu.models import KGNet
from kgtpu.train_lib import _train_step_body


def main():
    bs = int(os.environ.get("KGTPU_BENCH_BATCH", "8"))
    k = int(os.environ.get("KGTPU_BENCH_K", "1"))
    cfg = Config()
    # A/B hook for the gaussian target renderer (scan vs pallas) — suffixes
    # the metric name so logs can't conflate the arms
    renderer = os.environ.get("KGTPU_BENCH_RENDERER", "scan")
    # loss_fn string-matches "pallas"; anything else silently measures the
    # scan renderer under a mislabeled metric suffix — reject typos here
    assert renderer in ("scan", "pallas"), f"KGTPU_BENCH_RENDERER={renderer!r}"
    if renderer != "scan":
        import dataclasses
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, target_renderer=renderer))
    # A/B hook for activation rematerialization (--remat): fewer HBM bytes
    # for more FLOPs — the right trade iff the step is HBM-bound
    remat = os.environ.get("KGTPU_BENCH_REMAT", "0") == "1"
    if remat:
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, remat=True))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)

    ds = build_dataset(cfg.data)   # synthetic 512²
    nprng = np.random.default_rng(0)
    batch = make_batch(ds, list(range(bs)), cfg.data, augment=False,
                       rng=nprng)
    batch = {k_: jax.device_put(v) for k_, v in batch.items()}

    # the shipping step, re-wrapped without donation (bench_fn re-uses its
    # inputs across iterations); returning new_state keeps bwd+update live
    def one_step(s, b, r_):
        return _train_step_body(s, b, r_, model, cfg)

    if k > 1:
        stacked = {k_: jax.device_put(np.stack([np.asarray(v)] * k))
                   for k_, v in batch.items()}
        offs = jax.device_put(np.arange(k, dtype=np.int32))

        def fn(s, b, r_, o):
            def body(st, xs):
                bb, off = xs
                return one_step(st, bb, jax.random.fold_in(r_, off))
            return jax.lax.scan(body, s, (b, o), length=k)

        args = (state, stacked, rng, offs)
    else:
        fn, args = one_step, (state, batch, rng)

    # train MFU / roofline position (VERDICT r2 item 3): FLOPs of the exact
    # fwd+bwd+update program vs the bf16 peak, and the HBM-bandwidth bound
    # (cost analysis from the SAME compiled program — no second XLA compile)
    r = bench_fn(fn, *args, iters=10, warmup=2, with_cost=True)
    flops, nbytes = r["flops"], r["bytes"]              # per optimizer step
    if k > 1:
        # XLA's cost analysis of a While (lax.scan) program does NOT scale
        # its body by the trip count consistently (measured on this stack:
        # the k=8 scanned step reported ~3x ONE step's flops — neither 1x
        # nor 8x), so flops/bytes for the scanned program are taken from a
        # freshly-lowered SINGLE-step program instead: the scan body is the
        # identical per-step update (equality-tested in tests/test_train.py),
        # only the timing comes from the scanned program.  The extra lower()
        # is cost-analysis only — it is never executed or timed.
        flops, nbytes = cost_analysis(one_step, state, batch, rng)
    peak_fl, peak_bw = device_peak()
    img_s = bs * k * r["calls_per_sec"]
    mfu = (flops / bs) * img_s / peak_fl if peak_fl else None
    # time the program would take if purely HBM-bound at spec bandwidth
    bw_bound_ms = 1000 * nbytes / peak_bw if peak_bw else None
    emit({"metric": f"config2_train_step_batch{bs}_img_per_sec"
                    + (f"_k{k}" if k > 1 else "")
                    + (f"_{renderer}" if renderer != "scan" else "")
                    + ("_remat" if remat else ""),
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
