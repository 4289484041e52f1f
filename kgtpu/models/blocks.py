"""Shared conv building blocks (flax linen, NHWC)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class Norm(nn.Module):
    """Norm dispatcher.

    "group": GroupNorm with the group count chosen per layer width (largest
    divisor of C ≤ max_groups, so thin stems stay valid).  Batch-statistics
    free — DP needs no sync-BN machinery (SURVEY.md §2.10).  Default.
    "batch": real BatchNorm with running stats (reference-style).  Under a
    GSPMD-sharded batch the mean/var reductions span the sharded axis, so
    multi-chip training gets sync-BN semantics from the partitioner for free.
    """

    kind: str = "group"
    max_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "group":
            c = x.shape[-1]
            g = max(d for d in range(1, min(self.max_groups, c) + 1)
                    if c % d == 0)
            return nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train,
                                dtype=self.dtype)(x)
        raise ValueError(f"unknown norm kind: {self.kind}")


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
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        return nn.relu(x)


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
