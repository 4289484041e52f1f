"""Pallas fused GroupNorm(+ReLU) for the inference path.  [SURVEY.md C5;
BASELINE.md round-3 roofline: backbone = 27-29 ms of the 51 ms batch-32
e2e at ~43% of its HBM bound — the single largest remaining sink.]

XLA lowers conv -> GroupNorm -> relu as (conv write) + (stats-reduce read)
+ (normalize read + write): ~2R+2W of HBM traffic on the activation.  This
kernel keeps the whole per-sample activation VMEM-resident and does the
stats and the normalize without returning to HBM: 1R+1W, i.e. it removes
half the norm-related activation traffic of every ConvBlock/Residual in
the backbone, heads, and mask head.

Design notes (TPU-first):
  * layout: caller reshapes NHWC -> (B, H*W, C); the kernel sees one
    (HW, C) block per grid step — rows on sublanes, channels on lanes
    (C = 128 in the shipping config = exactly one lane tile).
  * stats: per-channel sum / sum-of-squares accumulated f32 over row
    chunks (a full-block .astype(f32) would triple VMEM), then reduced
    per *group* with a one-hot (C, G) membership matmul — reshapes that
    move the lane axis do not lower on Mosaic, a tiny MXU matmul does.
  * normalize: y = x * a + b with a = gamma * rsqrt(var + eps),
    b = beta - mean * a, optionally fused ReLU, written back bf16.
  * no custom VJP: the fused path is selected by `norm="group_fused"`
    which only the inference builder sets (kgtpu/infer.py); training
    keeps flax GroupNorm (its backward is already HBM-roofline-bound
    inside a fused XLA step — BASELINE.md train table).

Numerics match flax nn.GroupNorm (stats in f32, output cast to the
compute dtype) to bf16 resolution; parity is golden-tested against the
flax oracle in interpret mode on CPU and for real in the tpu-marked test.

MEASURED NEGATIVE RESULT (round 4) — ships default-OFF.  A 2x2 A/B of the
full batch-32 512² e2e bench on the v5e (back-to-back runs, same session):
fused 524.6 / 525.8 img/s vs flax GroupNorm 634.4 / 635.1 img/s — a
consistent -17%.  The HBM model above is right about the norm in
isolation, but wrong about the program: under XLA the conv's epilogue,
the stats reduce, and the normalize already fuse into neighboring ops,
while the Pallas call is an opaque boundary that forces the activation to
materialize in HBM on BOTH sides and re-pipelines it through Mosaic's
grid.  Same lesson as ops/tiling.py::_stitch_tiles_scatter: measure the
whole program, not the stage.  Kept (a) as the documented negative
result, (b) because `--fused_norm auto` remains a one-flag re-measure on
future hardware/XLA versions where the fusion landscape may differ.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Above this many bytes of (input + output) block the whole-sample block
# no longer fits VMEM comfortably next to Mosaic's pipeline buffers; the
# caller falls back to flax GroupNorm (only the 256x256x64 stem level
# exceeds this in the shipping config).
_VMEM_BLOCK_LIMIT = 10 * 1024 * 1024
# Below this per-sample block size the activation is cheap enough that the
# kernel's per-grid-step overhead outweighs the saved HBM passes (the mask
# head's 32² ROI blocks land here; the backbone/head 64²-128² blocks don't).
_MIN_BLOCK_BYTES = 512 * 1024


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, hw: int, c: int,
            groups: int, eps: float, relu: bool, chunk: int):
    cg = c // groups
    nchunks = hw // chunk

    def stat_body(i, acc):
        s, ss = acc
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (s + jnp.sum(xb, axis=0, keepdims=True),
                ss + jnp.sum(xb * xb, axis=0, keepdims=True))

    zero = jnp.zeros((1, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, nchunks, stat_body, (zero, zero))

    # group-membership one-hot: M[ch, g] = (ch // cg == g).  (1,C)@(C,G)
    # sums channel stats into group stats; (1,G)@(G,C) broadcasts back.
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ci // cg == gi).astype(jnp.float32)

    n = float(hw * cg)
    sum_g = jnp.dot(s, m, preferred_element_type=jnp.float32)
    ssq_g = jnp.dot(ss, m, preferred_element_type=jnp.float32)
    mean_g = sum_g / n
    var_g = ssq_g / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)

    a = inv_c * scale_ref[...].astype(jnp.float32)      # (1, C)
    b = bias_ref[...].astype(jnp.float32) - mean_c * a

    def out_body(i, _):
        xb = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xb * a + b
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, out_body, 0)


def fits_fused(h: int, w: int, c: int, itemsize: int = 2) -> bool:
    """True when the per-sample block is in the kernel's profitable range:
    big enough that the saved HBM passes beat the grid-step overhead, and
    small enough to fit the VMEM budget (lane dim padded to 128 — a C=64
    block costs 2x its logical bytes)."""
    padded_c = ((c + 127) // 128) * 128
    block = h * w * padded_c * itemsize
    return _MIN_BLOCK_BYTES <= block and 2 * block <= _VMEM_BLOCK_LIMIT


def fused_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                     num_groups: int, eps: float = 1e-6, relu: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """GroupNorm(+ReLU) over an NHWC tensor, one fused HBM round trip.

    Drop-in for `nn.GroupNorm(num_groups)(x)` (+ optional trailing relu):
    normalizes over (H, W, C/G) per sample per group, applies per-channel
    scale/bias.  Stats in f32 regardless of x.dtype (flax parity).
    """
    b, h, w, c = x.shape
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    hw = h * w
    x2 = x.reshape(b, hw, c)
    chunk = math.gcd(hw, 2048)
    kernel = functools.partial(_kernel, hw=hw, c=c, groups=num_groups,
                               eps=eps, relu=relu, chunk=chunk)
    # Mosaic double-buffers the in/out blocks across grid steps, so the
    # scoped-VMEM need is 2*(in+out) + f32 chunk temps — at the 128²x128
    # backbone level that is 16.01 MB, just past the compiler's 16 MB
    # default scoped limit (measured: "exceeded scoped vmem limit by
    # 12.0K").  The limit is a compiler default, not the physical VMEM;
    # raise it to what this block size actually needs.
    padded_c = ((c + 127) // 128) * 128
    block = hw * padded_c * x.dtype.itemsize
    vmem_bytes = 4 * block + chunk * padded_c * 4 * 4 + 1024 * 1024
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(b, h, w, c)
