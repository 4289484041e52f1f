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

Performance (round-2 profile, v5e batch 32): `lax.top_k` over the full
[C, H·W] map lowers to a bitonic sort and cost 0.84 ms/img at 128² — as much
as the whole backbone.  The fast path cuts the sort 4×:

  1. NMS deduplicates plateaus lexicographically (among window-equal maxima
     only the lowest row-major index survives — the framework-wide tie rule).
     This guarantees ≤ 1 surviving peak per 2×2 pixel block: two survivors in
     a block would sit in each other's 3×3 window, so the lower-valued (or
     higher-indexed, on ties) one would have been suppressed.
  2. The NMS'd map is max-reduced over 2×2 blocks (exact, by the guarantee)
     and top-k runs over H·W/4 candidates; full-resolution indices are
     recovered from the within-block argmax.
  3. One two-key sort by (score desc, full-res index asc) over the block
     survivors selects and orders the k winners — identical to the naive
     full-resolution decode for every nonzero candidate, ties included.

`dedup_plateaus=False` restores the reference's keep-all-plateau-pixels
behavior (every pixel equal to its window max survives) via the full-map
sort path.  With distinct scores the two modes return identical peaks; they
differ only on exact float ties, where the reference emits duplicates.
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


def _maxpool_nms(hm: jnp.ndarray, window: int = 3,
                 dedup_plateaus: bool = True) -> jnp.ndarray:
    """Suppress non-local-maxima: keep pixels equal to their 3×3 window max.

    With `dedup_plateaus` (default), window-equal survivors are further
    deduplicated: among surviving pixels of equal value within one window,
    only the lowest row-major index is kept (score desc, lowest index — the
    framework tie rule), so a flat plateau yields ONE peak, not several.
    """
    h, w, _ = hm.shape
    pooled = lax.reduce_window(
        hm,
        -jnp.inf,
        lax.max,
        window_dimensions=(window, window, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    achiever = hm == pooled
    if not dedup_plateaus:
        return jnp.where(achiever, hm, 0.0)
    # index of each *surviving* achiever, +inf elsewhere; a pixel stays only
    # if it is the lowest-index surviving achiever of its own value in its
    # window (suppressed achievers do not veto — they are not emitted peaks)
    big = jnp.float32(h * w)
    fidx = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w, 1)
    cand = jnp.where(achiever, fidx, big)
    min_idx = -lax.reduce_window(
        -cand,
        -big,
        lax.max,
        window_dimensions=(window, window, 1),
        window_strides=(1, 1, 1),
        padding="SAME",
    )
    keep = achiever & (cand == min_idx)
    return jnp.where(keep, hm, 0.0)


def _blocked_topk(prob: jnp.ndarray, k: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-class top-k of a plateau-deduplicated NMS'd map.

    prob [H, W, C] with ≤ 1 nonzero per 2×2 block (the `_maxpool_nms`
    dedup guarantee) → (scores [C, k], full-res flat indices [C, k]),
    ordered (score desc, index asc).  Sorts H·W/4 candidates instead of
    H·W — the decode hot spot (module docstring).
    """
    h, w, c = prob.shape
    h2, w2 = h // 2, w // 2
    blk = prob.reshape(h2, 2, w2, 2, c).transpose(0, 2, 1, 3, 4)
    blk = blk.reshape(h2, w2, 4, c)                       # block-major, then
    bv = jnp.max(blk, axis=2)                             # (dy, dx) position
    bpos = jnp.argmax(blk, axis=2).astype(jnp.int32)      # [h2, w2, c]

    # full-res flat index of each block's survivor, then ONE two-key sort by
    # (score desc, full-res index asc) — exact greedy order including ties
    # at the k boundary (a top_k + re-sort broke k-boundary ties by block
    # index instead)
    by = jnp.arange(h2, dtype=jnp.int32)[:, None, None]
    bx = jnp.arange(w2, dtype=jnp.int32)[None, :, None]
    fidx = (by * 2 + bpos // 2) * w + bx * 2 + bpos % 2   # [h2, w2, c]
    neg = -bv.reshape(h2 * w2, c).T                       # [C, H*W/4]
    idxs = fidx.reshape(h2 * w2, c).T
    neg_s, idx_s = lax.sort((neg, idxs), dimension=1, num_keys=2)
    return -neg_s[:, :k], idx_s[:, :k]


def decode_peaks(
    hm: jnp.ndarray,
    reg: jnp.ndarray | None,
    k: int,
    apply_sigmoid: bool = True,
    nms_window: int = 3,
    dedup_plateaus: bool = True,
) -> Peaks:
    """Decode the top-k peaks per keypoint class.

    Args:
      hm: [H, W, C] heatmap logits (or probabilities if apply_sigmoid=False).
      reg: [H, W, 2] sub-pixel offset map (dx, dy), or None.
      k: static number of peaks kept per class.
      apply_sigmoid: apply sigmoid to `hm` first (reference applies it at
        decode time on raw head logits).
      nms_window: max-pool NMS window (reference: 3).
      dedup_plateaus: keep one peak per equal-valued plateau (lowest index)
        instead of the reference's all-plateau-pixels; enables the 4×-smaller
        exact blocked top-k (module docstring).

    Returns:
      Peaks with scores [C,K], coords [C,K,2] (x, y float, stride units),
      indices [C,K].
    """
    h, w, c = hm.shape
    prob = jax.nn.sigmoid(hm) if apply_sigmoid else hm
    prob = _maxpool_nms(prob.astype(jnp.float32), nms_window, dedup_plateaus)

    if dedup_plateaus and nms_window >= 3 and h % 2 == 0 and w % 2 == 0 \
            and k <= (h * w) // 4:
        scores, idx = _blocked_topk(prob, k)              # [C, K] each
    else:
        flat = prob.reshape(h * w, c).T                   # [C, H*W]
        scores, idx = lax.top_k(flat, k)                  # [C, K] each
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
