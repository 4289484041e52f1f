"""Shared conv building blocks (flax linen, NHWC)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


class _FusedGroupNorm(nn.Module):
    """Param-tree twin of nn.GroupNorm computed by the Pallas fused kernel
    (kgtpu/ops/pallas/groupnorm.py).  Declares the same {scale, bias}
    params under the same "GroupNorm_0" path, so checkpoints are freely
    interchangeable between the flax (train) and fused (inference) paths.
    """

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    relu: bool = False

    @nn.compact
    def __call__(self, x):
        from kgtpu.ops.pallas.groupnorm import fused_group_norm
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        return fused_group_norm(x.astype(self.dtype), scale, bias,
                                self.num_groups, relu=self.relu)


class Norm(nn.Module):
    """Norm dispatcher.

    "group": GroupNorm with the group count chosen per layer width (largest
    divisor of C ≤ max_groups, so thin stems stay valid).  Batch-statistics
    free — DP needs no sync-BN machinery (SURVEY.md §2.10).  Default.
    "group_fused": same params/numerics, computed by the Pallas fused
    GroupNorm(+ReLU) kernel when running on TPU and the per-sample block
    fits VMEM; falls back to flax GroupNorm otherwise.  Selected by the
    inference builder only — the kernel has no VJP (training keeps flax).
    "batch": real BatchNorm with running stats (reference-style).  Under a
    GSPMD-sharded batch the mean/var reductions span the sharded axis, so
    multi-chip training gets sync-BN semantics from the partitioner for free.

    `relu=True` folds the trailing activation into the norm (fused into the
    Pallas kernel on the fused path; XLA fuses it anyway on the others).
    """

    kind: str = "group"
    max_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, relu: bool = False):
        if self.kind in ("group", "group_fused"):
            c = x.shape[-1]
            g = max(d for d in range(1, min(self.max_groups, c) + 1)
                    if c % d == 0)
            if self.kind == "group_fused":
                from kgtpu.ops.pallas.groupnorm import fits_fused
                b, h, w, _ = x.shape
                itemsize = jax.dtypes.canonicalize_dtype(self.dtype).itemsize
                if (jax.default_backend() == "tpu"
                        and fits_fused(h, w, c, itemsize=itemsize)):
                    return _FusedGroupNorm(num_groups=g, dtype=self.dtype,
                                           relu=relu,
                                           name="GroupNorm_0")(x)
            y = nn.GroupNorm(num_groups=g, dtype=self.dtype,
                             name="GroupNorm_0")(x)
        elif self.kind == "batch":
            y = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
        else:
            raise ValueError(f"unknown norm kind: {self.kind}")
        return nn.relu(y) if relu else y


class ConvBlock(nn.Module):
    """conv → norm → relu."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        return Norm(self.norm, dtype=self.dtype)(x, train, relu=True)


class Residual(nn.Module):
    """Pre-activation-free residual block (conv3-conv3 + projection skip)."""

    features: int
    stride: int = 1
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        y = ConvBlock(self.features, 3, self.stride, self.norm,
                      self.dtype)(x, train)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = Norm(self.norm, dtype=self.dtype)(y, train)
        if skip.shape[-1] != self.features or self.stride != 1:
            skip = nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride),
                           use_bias=False, dtype=self.dtype)(skip)
            skip = Norm(self.norm, dtype=self.dtype)(skip, train)
        return nn.relu(y + skip)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample — a reshape/broadcast, cheap on TPU."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
