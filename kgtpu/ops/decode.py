"""Peak decoder: heatmaps → sub-pixel keypoint peaks.  [SURVEY.md C9]

Reference behavior (SURVEY.md §3.2): `sigmoid(hm)` → 3×3 max-pool NMS (keep
local maxima) → per-class top-k → x,y from flat indices + gathered sub-pixel
offsets.  Here the whole decode is one fused fixed-shape device program:

  * max-pool NMS via `lax.reduce_window` (verified on the TPU, SURVEY §7.0);
  * `lax.top_k` over the flattened spatial axis per class — top_k's
    first-occurrence behavior gives the deterministic tie order
    (score desc, then row-major index asc) required by SURVEY §7.3 item 2;
  * offset gather via `jnp.take` on the flat index.

Layout is channel-last ([H, W, C]) to match the flax NHWC models.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class Peaks(NamedTuple):
    """Decoded per-class peaks, fixed shape [C, K]."""

    scores: jnp.ndarray   # [C, K] peak scores in [0, 1], descending per class
    coords: jnp.ndarray   # [C, K, 2] sub-pixel (x, y) in output-stride coords
    indices: jnp.ndarray  # [C, K] flat row-major spatial index of each peak


def _maxpool_nms(hm: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Suppress non-local-maxima: keep pixels equal to their 3×3 window max."""
    pooled = lax.reduce_window(
        hm,
        -jnp.inf,
        lax.max,
        window_dimensions=(window, window, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    return jnp.where(hm == pooled, hm, 0.0)


def decode_peaks(
    hm: jnp.ndarray,
    reg: jnp.ndarray | None,
    k: int,
    apply_sigmoid: bool = True,
    nms_window: int = 3,
) -> Peaks:
    """Decode the top-k peaks per keypoint class.

    Args:
      hm: [H, W, C] heatmap logits (or probabilities if apply_sigmoid=False).
      reg: [H, W, 2] sub-pixel offset map (dx, dy), or None.
      k: static number of peaks kept per class.
      apply_sigmoid: apply sigmoid to `hm` first (reference applies it at
        decode time on raw head logits).
      nms_window: max-pool NMS window (reference: 3).

    Returns:
      Peaks with scores [C,K], coords [C,K,2] (x, y float, stride units),
      indices [C,K].
    """
    h, w, c = hm.shape
    prob = jax.nn.sigmoid(hm) if apply_sigmoid else hm
    prob = _maxpool_nms(prob.astype(jnp.float32), nms_window)

    flat = prob.reshape(h * w, c).T                       # [C, H*W]
    scores, idx = lax.top_k(flat, k)                      # [C, K] each
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    if reg is not None:
        reg_flat = reg.reshape(h * w, 2).astype(jnp.float32)
        off = jnp.take(reg_flat, idx.reshape(-1), axis=0).reshape(c, k, 2)
        xs = xs + off[..., 0]
        ys = ys + off[..., 1]

    # sub-pixel offsets are nominally in [0, 1) but the head is unbounded;
    # clamp into the map so a wild regression can never push a peak outside
    # the heatmap frame (downstream grouping/ROI assume in-frame coords)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)

    coords = jnp.stack([xs, ys], axis=-1)                 # [C, K, 2]
    return Peaks(scores=scores, coords=coords, indices=idx)


def decode_center_wh(
    hm: jnp.ndarray,
    reg: jnp.ndarray | None,
    wh: jnp.ndarray,
    k: int,
    score_thresh: float = 0.0,
    apply_sigmoid: bool = True,
    nms_window: int = 3,
):
    """CenterNet-style decode: center peaks + regressed (w, h) → boxes.

    The alternative assembly mode (`GroupConfig.method = "centernet"`) using
    the optional size head (OPEN-2): no keypoint graph — each center peak
    becomes a box directly.  Faster and simpler than keypoint-graph grouping
    but without its robustness to center ambiguity on touching cells.

    Args:
      hm: [H, W, C] heatmap logits; the LAST channel is the center class
        (KP_CENTER) — other channels are ignored here.
      reg: [H, W, 2] sub-pixel offsets or None.
      wh: [H, W, 2] size head output (w, h) in stride units.
      k: peaks kept (= box count of the fixed-shape output).

    Returns:
      ops.group.Boxes-compatible tuple fields: boxes [K, 4] (stride coords),
      scores [K], valid [K].
    """
    from kgtpu.ops.group import Boxes  # local import to avoid a cycle

    h, w, c = hm.shape
    center = hm[..., c - 1:c]
    peaks = decode_peaks(center, reg, k, apply_sigmoid, nms_window)
    sc = peaks.scores[0]                                   # [K]
    xy = peaks.coords[0]                                   # [K, 2]
    wh_flat = wh.reshape(h * w, 2).astype(jnp.float32)
    size = jnp.take(wh_flat, peaks.indices[0].reshape(-1), axis=0)  # [K, 2]
    half = jnp.maximum(size, 0.0) * 0.5
    boxes = jnp.stack(
        [xy[:, 0] - half[:, 0], xy[:, 1] - half[:, 1],
         xy[:, 0] + half[:, 0], xy[:, 1] + half[:, 1]], axis=-1)
    valid = sc > score_thresh
    return Boxes(boxes=boxes, scores=jnp.where(valid, sc, 0.0), valid=valid)


def decode_peaks_batch(
    hm: jnp.ndarray, reg: jnp.ndarray | None, k: int,
    apply_sigmoid: bool = True, nms_window: int = 3,
) -> Peaks:
    """vmap of `decode_peaks` over a leading batch axis ([B,H,W,C] inputs)."""
    fn = lambda h_, r_: decode_peaks(h_, r_, k, apply_sigmoid, nms_window)
    if reg is None:
        return jax.vmap(lambda h_: decode_peaks(h_, None, k, apply_sigmoid,
                                                nms_window))(hm)
    return jax.vmap(fn)(hm, reg)
