#!/usr/bin/env python
"""Round-3 config 7: per-step WALL-CLOCK with k train steps per jitted
dispatch (train.py --steps_per_dispatch) vs one.

Unlike bench_config2 (pipelined device rate), this intentionally
synchronizes after every dispatch — fetching the loss scalar — because the
quantity under test is the host-side dispatch constant: the tunneled dev
TPU charges ~24 ms per jitted call (benchmarks/common.py), so a
synchronized single-step loop pays it k times more often than a scanned
k-step dispatch.  On production TPU VMs the constant is smaller but not
zero; on the CPU backend this mostly measures nothing (no dispatch floor)
and serves as a smoke test.

Env: KGTPU_BENCH_BATCH (default 8), KGTPU_BENCH_K (default 8),
KGTPU_BENCH_STEPS (total steps per arm, default 16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.common import emit
from kgtpu import train_lib
from kgtpu.config import Config
from kgtpu.data import build_dataset, make_batch, stack_batches
from kgtpu.models import KGNet


def main():
    bs = int(os.environ.get("KGTPU_BENCH_BATCH", "8"))
    k = int(os.environ.get("KGTPU_BENCH_K", "8"))
    total = int(os.environ.get("KGTPU_BENCH_STEPS", "16"))
    total = max(total - total % k, k)    # at least one full dispatch group
    if os.environ.get("KGTPU_BENCH_TINY"):      # CPU smoke-test mode
        from kgtpu.config import tiny_test_config
        cfg = tiny_test_config()
    else:
        cfg = Config()
    rng = jax.random.PRNGKey(0)
    state1 = train_lib.create_train_state(cfg, rng)
    state2 = jax.tree.map(np.copy, state1)
    model = KGNet(cfg=cfg.model)

    ds = build_dataset(cfg.data)   # synthetic 512²
    n_avail = max(len(ds) // bs, 1)
    batches = [make_batch(ds, list(range(i * bs, (i + 1) * bs)), cfg.data,
                          augment=False, rng=np.random.default_rng(0))
               for i in range(min(total, n_avail))]
    while len(batches) < total:                   # cycle if the dataset is
        batches.append(batches[len(batches) % n_avail])   # smaller

    step = train_lib.make_train_step(model, cfg)
    multi = train_lib.make_train_multi_step(model, cfg, k)

    # warmup both compiles (and one device round-trip each)
    s_w = jax.tree.map(np.copy, state1)
    s_w, m = step(s_w, batches[0], rng)
    float(m["loss"])
    stack0 = stack_batches(batches[:k])
    s_w, ms = multi(jax.tree.map(np.copy, state1), stack0, rng,
                    np.arange(k, dtype=np.int32))
    float(np.asarray(ms["loss"])[-1])

    # arm 1: synchronized single-step dispatches
    t0 = time.perf_counter()
    s = state1
    for i in range(total):
        s, m = step(s, batches[i], jax.random.fold_in(rng, i))
        float(m["loss"])                      # sync: expose the dispatch
    t_single = time.perf_counter() - t0

    # arm 2: k steps per dispatch
    t0 = time.perf_counter()
    s = state2
    for g in range(total // k):
        stacked = stack_batches(batches[g * k:(g + 1) * k])
        offs = np.arange(g * k, (g + 1) * k, dtype=np.int32)
        s, ms = multi(s, stacked, rng, offs)
        float(np.asarray(ms["loss"])[-1])     # sync once per dispatch
    t_multi = time.perf_counter() - t0

    emit({"metric": f"config7_steps_per_dispatch_k{k}_batch{bs}",
          "value": round(t_single / t_multi, 3),
          "unit": "x wall-clock speedup (synchronized dispatch loop)",
          "ms_per_step_single": round(1000 * t_single / total, 1),
          "ms_per_step_k": round(1000 * t_multi / total, 1),
          "steps": total, "vs_baseline": None})


if __name__ == "__main__":
    main()
