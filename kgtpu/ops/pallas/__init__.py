"""Pallas TPU kernels for ops where XLA's lowering leaves perf on the table.
[SURVEY.md §7.1 ops/pallas; §7.2 step 7 — written after profiling, not before]

Current kernels:
  gaussian.py — target-heatmap rendering with per-instance tile skipping
    (the XLA scan version is transcendental-bound; Gaussians are local, so
    >90% of its exp() work is on pixels a kernel can prove are ~0).
"""

from kgtpu.ops.pallas.gaussian import render_heatmaps_pallas

__all__ = ["render_heatmaps_pallas"]
