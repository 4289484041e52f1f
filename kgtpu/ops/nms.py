"""On-device box NMS + cross-scale merge.  [SURVEY.md C11, C16]

The reference suppresses grouped boxes with a host-side NumPy loop (or
torchvision's CUDA op — OPEN-4); either way it leaves the device.  Here NMS
is a fixed-shape suppression over a precomputed IoU matrix, so it composes
into the single jitted inference program.

Determinism (SURVEY.md §7.3 item 2): candidates are sorted score-descending
with index-ascending tie order before suppression, and the output keeps that
order (kept rows first via a stable re-sort on the kept mask).

Parallel-rounds construction (round 3; same trick as the grouper's matcher,
`group.py`): the round-2 implementation ran a `lax.fori_loop` over all N rows
— N=128 *sequential* tiny steps, pure latency, and the profiled largest
non-backbone tail once decode+group dropped to ~0.1 ms/img.  Greedy NMS is
a fixpoint that mostly resolves in parallel: a candidate whose every
higher-ranked overlapping candidate is already *dead* will certainly be kept
by sequential greedy (its potential suppressors can never be kept), and a
candidate overlapping an *accepted* box is certainly dead.  Each round
accepts every live row with no live higher-ranked conflict, then kills the
rows those accepts suppress; the lowest-ranked live row is always accepted,
so the loop terminates, and the invariant "dead ⇔ suppressed by a kept box"
makes the fixpoint exactly the sequential greedy keep-set — verified
element-exact against the NumPy greedy oracle and the old fori_loop form.
Overlap chains (A kills B, B would have killed C ⇒ C survives) resolve over
multiple rounds; typical detection sets finish in ≤ 4 rounds.
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
    """Greedy IoU suppression with fixed shapes (parallel rounds, see module
    docstring — identical keep-set to sequential greedy).

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
    # conflict[j, i]: row j outranks row i and overlaps it enough to suppress
    conflict = (idx[:, None] < idx[None, :]) & (iou > iou_thresh)

    def alive_any(state):
        live, _ = state
        return jnp.any(live)

    def round_(state):
        live, kept = state                                 # [N] bool each
        blocked = jnp.any(conflict & live[:, None], axis=0)
        acc = live & ~blocked          # all potential suppressors dead → kept
        dead = jnp.any(conflict & acc[:, None], axis=0)
        return live & ~acc & ~dead, kept | acc

    keep = lax.while_loop(
        alive_any, round_, (valid, jnp.zeros((n,), bool)))[1]

    # Compact: kept rows first, preserving score order (stable sort on ~keep).
    out_order = jnp.argsort(jnp.logical_not(keep), stable=True)[:max_out]
    return Boxes(
        boxes=boxes[out_order],
        scores=jnp.where(keep[out_order], scores[out_order], 0.0),
        valid=keep[out_order],
    )


def merge_scales(per_scale: list[Boxes], iou_thresh: float, max_out: int,
                 vote: str = "max", vote_iou: float = 0.5,
                 vote_thresh: float = 0.0) -> Boxes:
    """Cross-scale TTA merge: union of per-scale detections (already mapped to
    the common frame) → one NMS pass → top `max_out`.  [SURVEY.md C16]

    vote="max" (default) keeps each surviving box's own (maximum) score — the
    classic merge.  vote="mean" rescores each survivor with the mean over
    variants of that variant's best-matching candidate score (IoU >
    vote_iou; a variant with no match contributes 0), then drops survivors
    whose voted score falls below `vote_thresh`.  Rationale (VERDICT r2 item
    2 / round-2 measurement): max-merge can only ADD false positives as
    variants are added — a ghost seen by one variant of eight keeps its full
    score — which is why 3-scale+flip TTA *lowered* DSB mAP (the
    FP-punishing protocol) while raising COCO AP.  Cross-variant agreement
    is exactly the signal that separates real cells from per-variant ghosts.
    """
    cat = Boxes(
        boxes=jnp.concatenate([d.boxes for d in per_scale], axis=0),
        scores=jnp.concatenate([d.scores for d in per_scale], axis=0),
        valid=jnp.concatenate([d.valid for d in per_scale], axis=0),
    )
    merged = box_nms(cat, iou_thresh, max_out=max_out)
    if vote == "max":
        return merged
    assert vote == "mean", vote
    v = len(per_scale)
    iou = batched_box_iou(merged.boxes, cat.boxes)         # [D, V*Dv]
    m = (iou > vote_iou) & cat.valid[None, :]
    per_var = jnp.where(m, cat.scores[None, :], 0.0) \
        .reshape(merged.boxes.shape[0], v, -1)
    voted = jnp.mean(jnp.max(per_var, axis=-1), axis=-1)   # [D]
    valid = merged.valid & (voted >= vote_thresh)
    # restore (score desc, slot asc) order + kept-rows-first compaction under
    # the new scores — downstream paste priority and the eval slot contract
    # both assume it
    order = jnp.argsort(-jnp.where(valid, voted, -1.0), stable=True)
    return Boxes(
        boxes=merged.boxes[order],
        scores=jnp.where(valid[order], voted[order], 0.0),
        valid=valid[order],
    )
