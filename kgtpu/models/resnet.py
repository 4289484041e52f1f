"""ResNet-FPN backbone variant.  [SURVEY.md C5 "hourglass/ResNet backbone"]

A residual encoder (strides 4→32) with a top-down FPN decoder merged back to
stride 4 — the standard alternative backbone the reference family offers.
Single output stack.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kgtpu.models.blocks import ConvBlock, Residual, upsample2x


class ResNetFPN(nn.Module):
    features: int = 128                 # FPN channel width
    stage_blocks: tuple = (2, 2, 2, 2)  # residual blocks per stage
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features // 2, kernel=7, stride=2, norm=self.norm,
                      dtype=self.dtype)(x, train)
        x = Residual(self.features // 2, stride=2, norm=self.norm,
                     dtype=self.dtype)(x, train)

        # bottom-up: stride 4, 8, 16, 32
        feats = []
        width = self.features
        for si, nblocks in enumerate(self.stage_blocks):
            stride = 1 if si == 0 else 2
            x = Residual(width, stride=stride, norm=self.norm,
                         dtype=self.dtype)(x, train)
            for _ in range(nblocks - 1):
                x = Residual(width, norm=self.norm, dtype=self.dtype)(x, train)
            feats.append(x)
            width = min(width * 2, self.features * 4)

        # top-down FPN back to stride 4
        p = nn.Conv(self.features, (1, 1), dtype=self.dtype)(feats[-1])
        for f in reversed(feats[:-1]):
            lateral = nn.Conv(self.features, (1, 1), dtype=self.dtype)(f)
            p = lateral + upsample2x(p)
            p = ConvBlock(self.features, 3, norm=self.norm,
                          dtype=self.dtype)(p, train)
        return [p]
