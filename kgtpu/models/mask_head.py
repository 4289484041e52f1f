"""Stage-2 mask head.  [SURVEY.md C7; OPEN-3 resolution]

Consumes fixed-size ROI crops of stride-4 backbone features (not raw image
crops): one batched [D, R, R, F] tensor per image flows through a small FCN
with a learned 2x upsample, emitting [D, 2R, 2R] mask logits.  The fixed crop
size is what makes segmentation scale-invariant (the paper's "multi-scale"
property) while keeping every shape static for XLA.

Trained jointly with the keypoint heads on GT boxes (jittered); at inference
it runs once per image over the fixed max_detections boxes — never a
per-box host loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kgtpu.models.blocks import ConvBlock


class MaskHead(nn.Module):
    channels: int = 64
    num_convs: int = 3
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, crops, train: bool = False):
        """crops: [D, R, R, F] → mask logits [D, 2R, 2R]."""
        x = crops
        for _ in range(self.num_convs):
            x = ConvBlock(self.channels, 3, norm=self.norm,
                          dtype=self.dtype)(x, train)
        x = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype)(x)
        return x[..., 0]
