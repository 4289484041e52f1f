#!/usr/bin/env python
"""Stage-by-stage profile of the flagship 512² two-stage inference.

VERDICT.md round-1 item 2: perf work must be profiler-driven.  This script
answers "where do the ~2 ms/img go?" by timing each pipeline stage as its
own jitted program (scalar-forced, see benchmarks/common.py for why
block_until_ready cannot be trusted on the tunneled axon platform) and
reporting XLA cost analysis (FLOPs / bytes) per stage:

  backbone+heads | decode+group+nms | roi-crop+mask-head | paste

Stage programs re-run the upstream stages to produce their inputs, so the
per-stage time is obtained by differencing cumulative programs — this keeps
every measurement a single jit with no host round trips in the middle.

The stages are the SHIPPING batched path (`_detect_batch`/`_mask_batch`,
exactly what `build_infer_fn` compiles) — the round-2 version staged the
vmapped per-image form that infer.py had measured ~25% slower and removed,
so its stage shares could mis-rank optimization targets (VERDICT r2 item
7).  The last cumulative row IS build_infer_fn's program under the pinned
KGTPU_BENCH_DETS valid-detection load (bench.py convention — the chunked
mask/paste stages would otherwise skip everything on an untrained net);
its ms/img should match bench.py at the same batch within noise.

Usage:  python benchmarks/profile_flagship.py [batch] [--trace DIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.infer import _detect_batch, _mask_batch, _vars
from kgtpu.models import KGNet
from kgtpu.ops.preprocess import normalize_images
from kgtpu.train_lib import create_train_state


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else int(os.environ.get("KGTPU_BENCH_BATCH", "32"))
    trace_dir = ""
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]

    cfg = Config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    size = cfg.data.input_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, size=(batch, size, size, 3),
                                      dtype=np.uint8))

    # cumulative stage programs (each includes all previous stages); all of
    # them are prefixes of build_infer_fn's exact program
    def s1_backbone(params, imgs):
        x = normalize_images(imgs, cfg.data.mean, cfg.data.std)
        out = model.apply(_vars(params), x)
        return out["stacks"][-1]["hm"], out["feat"]

    def s2_detect(params, imgs):
        x = normalize_images(imgs, cfg.data.mean, cfg.data.std)
        dets, feats = _detect_batch(model, cfg, params, x)
        return dets.boxes, dets.scores, feats

    from benchmarks.common import pin_valid_dets
    ndets = int(os.environ.get("KGTPU_BENCH_DETS", "24"))

    def _pin(dets):
        return pin_valid_dets(dets, ndets)

    def s3_masklogits(params, imgs):
        from kgtpu.infer import _mask_probs
        x = normalize_images(imgs, cfg.data.mean, cfg.data.std)
        dets, feats = _detect_batch(model, cfg, params, x)
        dets = _pin(dets)
        return _mask_probs(model, cfg, params, feats, dets), dets.boxes

    def s4_full(params, imgs):
        x = normalize_images(imgs, cfg.data.mean, cfg.data.std)
        dets, feats = _detect_batch(model, cfg, params, x)
        dets = _pin(dets)
        return _mask_batch(model, cfg, params, feats, dets, size, size)

    stages = [("backbone_heads", s1_backbone), ("plus_decode_group", s2_detect),
              ("plus_roi_maskhead", s3_masklogits), ("full_with_paste", s4_full)]
    results = []
    prev_ms = 0.0
    prev_fl = 0.0
    for name, fn in stages:
        # cost from the SAME compiled program being timed — a separate
        # jit(fn) would be a second full XLA compile per stage
        r = bench_fn(fn, state.params, images, iters=10, warmup=2,
                     with_cost=True)
        fl, by = r["flops"], r["bytes"]
        ms = 1000 * r["sec_per_call"] / batch
        results.append({
            "stage": name,
            "cum_ms_per_img": round(ms, 4),
            "stage_ms_per_img": round(ms - prev_ms, 4),
            "cum_gflops_per_img": round(fl / batch / 1e9, 2),
            "stage_gflops_per_img": round((fl - prev_fl) / batch / 1e9, 2),
            "cum_bytes_mb_per_img": round(by / batch / 1e6, 1),
        })
        prev_ms, prev_fl = ms, fl

    if trace_dir:
        full = jax.jit(s4_full)
        _ = jax.block_until_ready(full(state.params, images))
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = full(state.params, images)
            jax.block_until_ready(out)
        print(f"# trace written to {trace_dir}", file=sys.stderr)

    for row in results:
        emit(row)


if __name__ == "__main__":
    main()
