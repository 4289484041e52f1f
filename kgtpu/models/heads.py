"""Keypoint prediction heads.  [SURVEY.md C6]

Per-stack heads on the stride-4 feature map:
  hm  [H/4, W/4, 5] heatmap logits (bias-initialized to -2.19 ≈ logit(0.1)
      so the focal loss starts from a low-foreground prior, CornerNet-style);
  reg [H/4, W/4, 2] sub-pixel offsets;
  wh  [H/4, W/4, 2] optional box size regression (OPEN-2, off by default).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class KeypointHeads(nn.Module):
    num_classes: int = 5
    hidden: int = 128
    use_wh: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        def head(out_ch, bias_init=0.0, name=None):
            h = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype,
                        name=None if name is None else f"{name}_conv")(feat)
            h = nn.relu(h)
            return nn.Conv(
                out_ch, (1, 1), dtype=self.dtype,
                bias_init=nn.initializers.constant(bias_init),
                name=None if name is None else f"{name}_out",
            )(h)

        out = {
            "hm": head(self.num_classes, bias_init=-2.19, name="hm"),
            "reg": head(2, name="reg"),
        }
        if self.use_wh:
            out["wh"] = head(2, name="wh")
        return out
