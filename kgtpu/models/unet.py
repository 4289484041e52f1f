"""U-Net backbone variant.  [SURVEY.md C5 — zoo extension beyond the
reference's hourglass/ResNet pair]

The domain-classic encoder–decoder for cell/nuclei segmentation
(Ronneberger 2015): double-conv stages, max-pool down, skip-concat up —
here with the framework's shared stride-4 stem so the keypoint/mask
pipeline consumes the same stride-4 feature map every backbone produces.
Single output stack (like resnet_fpn).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kgtpu.models.blocks import ConvBlock, upsample2x


class UNetBackbone(nn.Module):
    features: int = 64                  # width at stride 4
    depth: int = 4                      # pool/upsample pairs below the stem
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    max_width: int = 512                # channel cap at the bottleneck

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.features // 2, kernel=7, stride=2,
                      norm=self.norm, dtype=self.dtype)(x, train)
        x = ConvBlock(self.features, kernel=3, stride=2,
                      norm=self.norm, dtype=self.dtype)(x, train)

        skips = []
        width = self.features
        for _ in range(self.depth):
            x = ConvBlock(width, norm=self.norm, dtype=self.dtype)(x, train)
            x = ConvBlock(width, norm=self.norm, dtype=self.dtype)(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            width = min(width * 2, self.max_width)

        x = ConvBlock(width, norm=self.norm, dtype=self.dtype)(x, train)
        x = ConvBlock(width, norm=self.norm, dtype=self.dtype)(x, train)

        for skip in reversed(skips):
            x = upsample2x(x)
            x = jnp.concatenate([x, skip], axis=-1)
            w = skip.shape[-1]
            x = ConvBlock(w, norm=self.norm, dtype=self.dtype)(x, train)
            x = ConvBlock(w, norm=self.norm, dtype=self.dtype)(x, train)
        return [x]
