#!/usr/bin/env python
"""The named secondary metric (BASELINE.md): decode+group ms/img — the
reference's host-side bottleneck (SURVEY.md §3.2 "THE bottleneck"), here one
fused device program: maxpool-NMS → top-k → keypoint-graph match → box NMS."""

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
    batch = int(os.environ.get("KGTPU_BENCH_BATCH", "16"))
    cfg = Config()
    rng = np.random.default_rng(0)
    # realistic sparse-ish heatmaps: low background + planted peaks
    hm = rng.normal(-4.0, 0.5, size=(batch, 128, 128, 5)).astype(np.float32)
    for b in range(batch):
        for _ in range(64):
            y, x = rng.integers(2, 126, 2)
            hm[b, y, x, :] = rng.normal(2.0, 1.0, 5)
    reg = rng.uniform(-0.5, 0.5, size=(batch, 128, 128, 2)).astype(np.float32)

    def decode_group(hm, reg):
        def one(h, r):
            peaks = decode_peaks(h, r, cfg.group.max_peaks_per_class)
            return box_nms(group_keypoints(peaks, cfg.group),
                           cfg.group.nms_iou)
        return jax.vmap(one)(hm, reg)

    r = bench_fn(decode_group, jnp.asarray(hm), jnp.asarray(reg), iters=10)
    emit({"metric": "decode_group_ms_per_img",
          "value": round(1000 * r["sec_per_call"] / batch, 3), "unit": "ms/img",
          "batch": batch,
          "note": "includes the ~31ms tunnel RTT amortized over the batch",
          "vs_baseline": None})


if __name__ == "__main__":
    main()
