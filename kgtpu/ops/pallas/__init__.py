"""Pallas TPU kernels for ops where XLA's lowering leaves perf on the table.
[SURVEY.md §7.1 ops/pallas; §7.2 step 7 — written after profiling, not before]

Current kernels:
  gaussian.py — target-heatmap rendering with per-instance tile skipping
    (the XLA scan version is transcendental-bound; Gaussians are local, so
    >90% of its exp() work is on pixels a kernel can prove are ~0).
  groupnorm.py — fused GroupNorm(+ReLU) for the inference path: stats and
    normalize in one VMEM-resident pass (1R+1W of HBM vs XLA's ~2R+2W),
    targeting the round-3 backbone roofline gap.
"""

from kgtpu.ops.pallas.gaussian import render_heatmaps_pallas
from kgtpu.ops.pallas.groupnorm import fused_group_norm

__all__ = ["fused_group_norm", "render_heatmaps_pallas"]
