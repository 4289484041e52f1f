#!/usr/bin/env python
"""Substage profile of the decode→group→NMS pipeline (the round-2 perf
target: profile_flagship.py showed decode+group at ~1.3 ms/img — 38% of the
flagship wall — with only 9.7 GFLOP, i.e. latency/bandwidth-bound, not MXU).

Times cumulative programs (decode | +group | +nms) and differences them,
same methodology as profile_flagship.py.

Caveat (measured round 2): every jitted call on the tunneled TPU carries a
~24 ms host dispatch floor even when pipelined — a bare sigmoid over the
same batch "costs" ~0.75 ms/img here.  Absolute cum_ms values include that
constant; only the stage differences are device time.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import bench_fn, emit
from kgtpu.config import Config
from kgtpu.ops.decode import decode_peaks
from kgtpu.ops.group import group_keypoints
from kgtpu.ops.nms import box_nms


def main():
    batch = int(os.environ.get("KGTPU_BENCH_BATCH", "32"))
    cfg = Config()
    rng = np.random.default_rng(0)
    hm = rng.normal(-4.0, 0.5, size=(batch, 128, 128, 5)).astype(np.float32)
    for b in range(batch):
        for _ in range(64):
            y, x = rng.integers(2, 126, 2)
            hm[b, y, x, :] = rng.normal(2.0, 1.0, 5)
    reg = rng.uniform(-0.5, 0.5, size=(batch, 128, 128, 2)).astype(np.float32)
    hm, reg = jnp.asarray(hm), jnp.asarray(reg)

    def s1_decode(hm, reg):
        def one(h, r):
            p = decode_peaks(h, r, cfg.group.max_peaks_per_class)
            return p.scores, p.coords
        return jax.vmap(one)(hm, reg)

    def s2_group(hm, reg):
        def one(h, r):
            p = decode_peaks(h, r, cfg.group.max_peaks_per_class)
            g = group_keypoints(p, cfg.group)
            return g.boxes, g.scores
        return jax.vmap(one)(hm, reg)

    def s3_nms(hm, reg):
        def one(h, r):
            p = decode_peaks(h, r, cfg.group.max_peaks_per_class)
            g = box_nms(group_keypoints(p, cfg.group), cfg.group.nms_iou)
            return g.boxes, g.scores
        return jax.vmap(one)(hm, reg)

    prev = 0.0
    for name, fn in [("decode_peaks", s1_decode), ("plus_group", s2_group),
                     ("plus_nms", s3_nms)]:
        r = bench_fn(fn, hm, reg, iters=10)
        ms = 1000 * r["sec_per_call"] / batch
        emit({"stage": name, "cum_ms_per_img": round(ms, 4),
              "stage_ms_per_img": round(ms - prev, 4), "batch": batch})
        prev = ms


if __name__ == "__main__":
    main()
