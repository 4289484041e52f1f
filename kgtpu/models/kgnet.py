"""KGNet: full model assembly.  [SURVEY.md L1 / C5-C7]

`__call__` runs backbone + per-stack keypoint heads and returns
  {"stacks": [ {hm, reg, (wh)} per stack ], "feat": last stride-4 features}.
`mask_logits` runs the stage-2 head over ROI crops of those features.

The two entry points are separate flax methods so inference can be staged:
boxes are decoded from the head outputs, then `mask_logits` is applied to a
fixed-count crop batch — all inside one jitted program (SURVEY.md §3.2's
host round-trip eliminated).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kgtpu.config import ModelConfig
from kgtpu.models.heads import KeypointHeads
from kgtpu.models.hourglass import HourglassBackbone
from kgtpu.models.mask_head import MaskHead
from kgtpu.models.resnet import ResNetFPN
from kgtpu.models.unet import UNetBackbone
from kgtpu.ops.roi import crop_and_resize


class KGNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        if self.cfg.backbone in ("hourglass", "hourglass_lite",
                                 "hourglass_fast"):
            self.backbone = HourglassBackbone(
                num_stacks=self.cfg.num_stacks,
                features=self.cfg.base_channels,
                depth=self.cfg.hg_depth,
                norm=self.cfg.norm,
                dtype=dtype,
                remat=self.cfg.remat,
                slim_top=1 if self.cfg.backbone == "hourglass_fast" else 0,
            )
            n_heads = self.cfg.num_stacks
        elif self.cfg.backbone == "resnet_fpn":
            self.backbone = ResNetFPN(
                features=self.cfg.base_channels, norm=self.cfg.norm, dtype=dtype)
            n_heads = 1
        elif self.cfg.backbone == "unet":
            self.backbone = UNetBackbone(
                features=self.cfg.base_channels, depth=self.cfg.hg_depth,
                norm=self.cfg.norm, dtype=dtype)
            n_heads = 1
        else:
            raise ValueError(f"unknown backbone: {self.cfg.backbone}")

        self.heads = [
            KeypointHeads(
                num_classes=self.cfg.num_kp_classes,
                hidden=self.cfg.head_channels,
                use_wh=self.cfg.use_wh_head,
                dtype=dtype,
                name=f"heads_{i}",
            )
            for i in range(n_heads)
        ]
        self.mask_head = MaskHead(
            channels=self.cfg.mask_channels, norm=self.cfg.norm, dtype=dtype)

    def __call__(self, images: jnp.ndarray, train: bool = False) -> dict:
        """images [B, H, W, 3] → {"stacks": [...], "feat": [B, H/4, W/4, F]}."""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        if (self.cfg.inter_inject
                and self.cfg.backbone in ("hourglass", "hourglass_lite",
                                          "hourglass_fast")
                and self.cfg.num_stacks > 1):
            # CornerNet-style prediction feedback: heads run inside the
            # backbone loop so stack i's logits are re-injected into stack
            # i+1's input (heads' params still live under this module)
            feats, preds = self.backbone(images.astype(dtype), train,
                                         head_fns=list(self.heads))
            stacks = [
                {k: v.astype(jnp.float32) for k, v in p.items()}
                for p in preds
            ]
        else:
            feats = self.backbone(images.astype(dtype), train)
            stacks = [
                {k: v.astype(jnp.float32) for k, v in head(f).items()}
                for head, f in zip(self.heads, feats)
            ]
        return {"stacks": stacks, "feat": feats[-1]}

    def init_all(self, images: jnp.ndarray) -> dict:
        """Init-only entry point touching every submodule (flax creates params
        lazily per invoked method, so plain __call__ would skip the mask head)."""
        out = self(images)
        dummy_boxes = jnp.tile(
            jnp.asarray([[0.0, 0.0, 8.0, 8.0]]), (2, 1))
        _ = self.mask_logits(out["feat"][0], dummy_boxes)
        return out

    def apply_mask_head(self, crops: jnp.ndarray, train: bool = False
                        ) -> jnp.ndarray:
        """Run the mask head on pre-cropped features [D, R, R, F] → [D, m, m].
        (Train path: one flat apply so BatchNorm's mutable stats are not
        vmapped per image.)"""
        dtype = jnp.dtype(self.cfg.compute_dtype)
        return self.mask_head(crops.astype(dtype), train).astype(jnp.float32)

    def mask_logits(self, feat: jnp.ndarray, boxes: jnp.ndarray,
                    train: bool = False) -> jnp.ndarray:
        """feat [H/4, W/4, F] (single image), boxes [D, 4] in *feature* (i.e.
        output-stride) coordinates → mask logits [D, mask_size, mask_size]."""
        crops = crop_and_resize(feat, boxes, self.cfg.roi_size)
        dtype = jnp.dtype(self.cfg.compute_dtype)
        return self.mask_head(crops.astype(dtype), train).astype(jnp.float32)


def build_model(cfg: ModelConfig) -> KGNet:
    return KGNet(cfg=cfg)
