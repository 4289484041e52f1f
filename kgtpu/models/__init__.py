"""Model zoo: backbones + heads, flax/NHWC.  [SURVEY.md C5-C7]

Backbones produce a stride-4 feature map; keypoint heads emit 5-channel
heatmap logits + 2-channel sub-pixel offsets (optionally 2-channel w/h,
OPEN-2); the mask head consumes fixed-size ROI crops of backbone features
(OPEN-3).  All modules run in a configurable compute dtype (bfloat16 by
default) with float32 params, keeping the convs on the MXU.
"""

from kgtpu.models.kgnet import KGNet, build_model

__all__ = ["KGNet", "build_model"]
