"""Shared conv building blocks (flax linen, NHWC)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm with the group count chosen per layer width: the largest
    divisor of C not exceeding `max_groups` (thin stems stay valid)."""

    max_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = max(d for d in range(1, min(self.max_groups, c) + 1) if c % d == 0)
        return nn.GroupNorm(num_groups=g, dtype=self.dtype)(x)


def norm_layer(kind: str, dtype) -> Callable:
    """GroupNorm by default: batch-statistics-free, so data-parallel training
    needs no cross-chip sync-BN (SURVEY.md §2.10); "batch" is available for
    reference-style behavior."""
    if kind == "group":
        return lambda: AdaptiveGroupNorm(dtype=dtype)
    if kind == "batch":
        # use_running_average is threaded by the caller via mutable collections
        return lambda: nn.BatchNorm(use_running_average=True, dtype=dtype)
    raise ValueError(f"unknown norm kind: {kind}")


class ConvBlock(nn.Module):
    """conv → norm → relu."""

    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=False, dtype=self.dtype)(x)
        x = norm_layer(self.norm, self.dtype)()(x)
        return nn.relu(x)


class Residual(nn.Module):
    """Pre-activation-free residual block (conv3-conv3 + projection skip)."""

    features: int
    stride: int = 1
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = x
        y = ConvBlock(self.features, 3, self.stride, self.norm, self.dtype)(x)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = norm_layer(self.norm, self.dtype)()(y)
        if skip.shape[-1] != self.features or self.stride != 1:
            skip = nn.Conv(self.features, (1, 1),
                           strides=(self.stride, self.stride),
                           use_bias=False, dtype=self.dtype)(skip)
            skip = norm_layer(self.norm, self.dtype)()(skip)
        return nn.relu(y + skip)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample — a reshape/broadcast, cheap on TPU."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
