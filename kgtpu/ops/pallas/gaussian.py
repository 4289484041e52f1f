"""Pallas gaussian-splat renderer.  [SURVEY.md C4, §7.3 item 3]

Same semantics as `kgtpu.ops.targets.render_heatmaps` (CornerNet-style
integer-centered splats, max-combined), but implemented as a row-tiled TPU
kernel that *skips instances whose Gaussian cannot reach the current tile*:

  grid = (H / TILE_H,); out block [C, TILE_H, W]
  for each instance (fori over N):
    bound = (row-distance to tile)² · coef      # scalar
    @pl.when(bound < CUTOFF):                   # exp(-bound) would be ~0
      acc = max(acc, exp(-((dx² + dy²) · coef)))

The XLA scan version evaluates exp on every (instance × pixel) pair —
N·C·H·W ≈ 10.5M transcendentals per 512² image; with typical cell datasets
an instance's support covers only a few row-tiles, so the kernel does ~10%
of that work.  Targets carry no gradients (they're data), so no custom VJP
is needed — callers wrap results in stop_gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgtpu.ops.targets import gaussian_radius

# exp(-14) ≈ 8e-7 — below float32 target resolution for heatmaps in [0, 1]
_CUTOFF = 14.0


def _kernel(kx_ref, ky_ref, coef_ref, out_ref, *, tile_h: int, width: int,
            n_inst: int, n_classes: int):
    # Per-instance scalars live in SMEM (dynamic lane-axis VMEM reads don't
    # lower — "index in dimension 1 not a multiple of 128").
    th = tile_h
    base = (pl.program_id(0) * th).astype(jnp.float32)

    ys = base + jax.lax.broadcasted_iota(
        jnp.int32, (th, width), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(
        jnp.int32, (th, width), 1).astype(jnp.float32)

    out_ref[...] = jnp.zeros((n_classes, th, width), jnp.float32)

    def body(i, _):
        coef = coef_ref[0, i]                       # 1/(2σ²) · valid
        kys = [ky_ref[c, i] for c in range(n_classes)]
        ky_lo, ky_hi = kys[0], kys[0]
        for v in kys[1:]:
            ky_lo = jnp.minimum(ky_lo, v)
            ky_hi = jnp.maximum(ky_hi, v)
        # row-interval distance between the tile band and the keypoint band
        dy_tile = jnp.maximum(
            jnp.maximum(base - ky_hi, ky_lo - (base + th - 1)), 0.0)
        bound = dy_tile * dy_tile * coef

        @pl.when((bound < _CUTOFF) & (coef > 0.0))
        def _():
            for c in range(n_classes):
                dx = xs - kx_ref[c, i]
                dy = ys - kys[c]
                g = jnp.exp(-(dx * dx + dy * dy) * coef)
                out_ref[c] = jnp.maximum(out_ref[c], g)

        return 0

    jax.lax.fori_loop(0, n_inst, body, 0)


def render_heatmaps_pallas(
    kpts: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    min_overlap: float = 0.7,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.targets.render_heatmaps ([N,C,2] kpts → [H,W,C]).

    Matches the scan implementation to ~1e-8 on the v5e.  Not (yet) the
    train-step default: at 128 instances / 128² maps the step is
    backbone-bound and the kernel gains nothing end-to-end, while the axon
    remote-compile path adds operational risk; it becomes the right choice
    when instance counts or map sizes grow.  `interpret=True` runs the
    kernel on CPU for tests.
    """
    n, c, _ = kpts.shape
    kpts = jnp.floor(kpts.astype(jnp.float32))
    radius = gaussian_radius(sizes_hw.astype(jnp.float32), min_overlap)
    sigma = (2.0 * jnp.floor(radius) + 1.0) / 6.0
    coef = jnp.where(valid > 0, 1.0 / (2.0 * sigma * sigma + 1e-12), 0.0)

    kx = kpts[..., 0].T                              # [C, N]
    ky = kpts[..., 1].T
    coef2 = coef[None, :]                            # [1, N]

    kernel = functools.partial(_kernel, tile_h=tile_h, width=width,
                               n_inst=n, n_classes=c)
    out = pl.pallas_call(
        kernel,
        grid=(height // tile_h,),
        in_specs=[
            pl.BlockSpec((c, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((c, tile_h, width), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, height, width), jnp.float32),
        interpret=interpret,
    )(kx, ky, coef2)
    return jnp.transpose(out, (1, 2, 0))             # [H, W, C]
