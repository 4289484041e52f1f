"""Fixed-shape device ops — the core of the framework.  [SURVEY.md C4, C9-C13]

Every op here is pure, static-shape, and jit-compilable with no host
callbacks.  Variable-count quantities (instances, peaks, boxes) are padded to
config-declared maxima and carry an explicit validity mask — this is the
design rule (SURVEY.md §7.1) that makes the pipeline TPU-native rather than a
port of the reference's host-side NumPy loops.
"""

from kgtpu.ops.targets import (
    gaussian_radius,
    keypoints_from_boxes,
    render_heatmaps,
)
from kgtpu.ops.decode import decode_peaks
from kgtpu.ops.group import group_keypoints
from kgtpu.ops.nms import batched_box_iou, box_nms, merge_scales
from kgtpu.ops.preprocess import normalize_images
from kgtpu.ops.roi import crop_and_resize, paste_masks, paste_masks_batch

__all__ = [
    "normalize_images",
    "gaussian_radius",
    "keypoints_from_boxes",
    "render_heatmaps",
    "decode_peaks",
    "group_keypoints",
    "batched_box_iou",
    "box_nms",
    "merge_scales",
    "crop_and_resize",
    "paste_masks",
    "paste_masks_batch",
]
