"""Model zoo: backbones + heads, flax/NHWC.  [SURVEY.md C5-C7]

Backbones produce a stride-4 feature map; keypoint heads emit 5-channel
heatmap logits + 2-channel sub-pixel offsets (optionally 2-channel w/h,
OPEN-2); the mask head consumes fixed-size ROI crops of backbone features
(OPEN-3).  All modules run in a configurable compute dtype (bfloat16 by
default) with float32 params, keeping the convs on the MXU.
"""

from kgtpu.models.kgnet import KGNet, build_model


def required_divisor(cfg) -> int:
    """Input sides must be divisible by this (stride-4 stem × the backbone's
    internal pool/upsample pairs) or shapes break mid-network — validated at
    the CLIs so users get a clear message instead of a flax broadcast error."""
    if cfg.backbone in ("hourglass", "hourglass_lite", "hourglass_fast",
                        "unet"):
        return 4 * (2 ** cfg.hg_depth)
    if cfg.backbone == "resnet_fpn":
        return 32          # stride-4 stem + three stride-2 stages
    return 4


__all__ = ["KGNet", "build_model", "required_divisor"]
