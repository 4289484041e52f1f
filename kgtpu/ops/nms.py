"""On-device box NMS + cross-scale merge.  [SURVEY.md C11, C16]

The reference suppresses grouped boxes with a host-side NumPy loop (or
torchvision's CUDA op — OPEN-4); either way it leaves the device.  Here NMS
is a fixed-shape `lax.fori_loop` greedy suppression over a precomputed IoU
matrix, so it composes into the single jitted inference program.

Determinism (SURVEY.md §7.3 item 2): candidates are sorted score-descending
with index-ascending tie order before suppression, and the output keeps that
order (kept rows first via a stable re-sort on the kept mask).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from kgtpu.ops.group import Boxes


def batched_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU.  a: [N, 4], b: [M, 4] (x0, y0, x1, y1) → [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0.0) * jnp.maximum(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0.0) * jnp.maximum(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def box_nms(dets: Boxes, iou_thresh: float, max_out: int | None = None) -> Boxes:
    """Greedy IoU suppression with fixed shapes.

    Args:
      dets: candidate boxes (any order; invalid rows masked out).
      iou_thresh: boxes with IoU > thresh against a kept higher-scored box
        are suppressed (strict >, matching the common NumPy reference).
      max_out: output row count (default: same as input).

    Returns:
      Boxes with kept detections first (score-descending), padding after.
    """
    n = dets.boxes.shape[0]
    max_out = max_out or n

    # Sort score-descending (invalid rows sink to the bottom with score -1).
    sort_key = jnp.where(dets.valid, dets.scores, -1.0)
    order = jnp.argsort(-sort_key, stable=True)
    boxes = dets.boxes[order]
    scores = dets.scores[order]
    valid = dets.valid[order]

    iou = batched_box_iou(boxes, boxes)                    # [N, N]
    idx = jnp.arange(n)

    def body(i, keep):
        # Row i survives iff it is valid and no kept earlier row overlaps it.
        suppressed = jnp.any(keep & (idx < i) & (iou[:, i] > iou_thresh))
        keep_i = valid[i] & jnp.logical_not(suppressed)
        return keep.at[i].set(keep_i)

    keep = lax.fori_loop(0, n, body, jnp.zeros((n,), bool))

    # Compact: kept rows first, preserving score order (stable sort on ~keep).
    out_order = jnp.argsort(jnp.logical_not(keep), stable=True)[:max_out]
    return Boxes(
        boxes=boxes[out_order],
        scores=jnp.where(keep[out_order], scores[out_order], 0.0),
        valid=keep[out_order],
    )


def merge_scales(per_scale: list[Boxes], iou_thresh: float, max_out: int) -> Boxes:
    """Cross-scale TTA merge: union of per-scale detections (already mapped to
    the common frame) → one NMS pass → top `max_out`.  [SURVEY.md C16]"""
    cat = Boxes(
        boxes=jnp.concatenate([d.boxes for d in per_scale], axis=0),
        scores=jnp.concatenate([d.scores for d in per_scale], axis=0),
        valid=jnp.concatenate([d.valid for d in per_scale], axis=0),
    )
    return box_nms(cat, iou_thresh, max_out=max_out)
