"""Keypoint-graph grouping: peaks → boxes.  [SURVEY.md C10; §7.3 item 1]

The reference groups decoded keypoints into boxes with per-image Python loops
over keypoint pairs — "THE bottleneck" its TPU rebuild targets (SURVEY.md
§3.2).  Here grouping is a single fixed-shape device program: an all-pairs
compatibility tensor plus vectorized nearest-keypoint support lookups, so the
O(K²·K) pair scan runs on the VPU instead of the host.

Graph semantics (OPEN-1/OPEN-9 resolution, paper rule; every constant is a
`GroupConfig` field):

  nodes   = decoded peaks of the 5 classes (TL, TR, BL, BR, CENTER);
  edges   = (TL_i, BR_j) pairs with valid geometry (x/y ordered, min size);
  an edge is *supported* by the other three classes through geometric
  consistency — the pair's midpoint must lie near a CENTER peak, and the
  implied (BR_j.x, TL_i.y) / (TL_i.x, BR_j.y) corners near TR / BL peaks
  (tolerances relative to the pair's diagonal, support decaying linearly
  with distance so sloppy matches score low);
  edges are then resolved into a *matching*: boxes are emitted greedily by
  descending edge score, and each TL / BR node is consumed by at most one
  box — this kills cross-instance "ghost" pairs, whose corners are claimed
  first by the true (higher-scoring) boxes.  Residual duplicates are removed
  by box NMS downstream.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from kgtpu.config import KP_BL, KP_BR, KP_CENTER, KP_TL, KP_TR, GroupConfig
from kgtpu.ops.decode import Peaks


class Boxes(NamedTuple):
    """Fixed-count detections, padded with valid=False rows."""

    boxes: jnp.ndarray   # [D, 4] (x0, y0, x1, y1), output-stride coords
    scores: jnp.ndarray  # [D] in [0, 1], descending over valid rows
    valid: jnp.ndarray   # [D] bool


def _nearest_support(
    points: jnp.ndarray,      # [..., 2] query points (expected kp location)
    diag: jnp.ndarray,        # [...] pair diagonal (tolerance scale)
    kp_xy: jnp.ndarray,       # [K, 2] candidate peaks of the supporting class
    kp_score: jnp.ndarray,    # [K]
    score_thresh: float,
    tol: float,
) -> jnp.ndarray:
    """Distance-decayed score of the nearest supporting peak.

    Returns `peak_score * (1 - dist / (tol * diag))` for the nearest valid
    peak when dist < tol*diag, else 0 — so support fades with geometric
    inconsistency instead of being a hard in/out test.
    """
    d2 = jnp.sum(
        (points[..., None, :] - kp_xy[None, None, :, :]) ** 2, axis=-1
    )                                                     # [..., K]
    d2 = jnp.where(kp_score[None, None, :] > score_thresh, d2, jnp.inf)
    # min + argmin as two fused reductions over the virtual [..., K] axis —
    # the earlier argmin + take_along_axis form forced XLA to materialize the
    # whole [K, K, K] distance tensor (a round-2 profiled HBM sink)
    best = jnp.argmin(d2, axis=-1)                        # [...]
    best_d = jnp.sqrt(jnp.min(d2, axis=-1))
    best_score = kp_score[best]
    decay = jnp.maximum(1.0 - best_d / jnp.maximum(tol * diag, 1e-6), 0.0)
    return jnp.where(jnp.isfinite(best_d), best_score * decay, 0.0)


def group_keypoints(peaks: Peaks, cfg: GroupConfig,
                    kp_wh: jnp.ndarray | None = None) -> Boxes:
    """Assemble boxes from decoded per-class peaks.

    Args:
      peaks: decoder output, scores [5, K] / coords [5, K, 2].
      cfg: grouping thresholds (static — baked into the jitted program).
      kp_wh: optional [5, K, 2] (w, h) size-head values gathered at each
        peak's pixel (stride units).  With `cfg.size_prune > 0`, a (TL, BR)
        pair whose span exceeds `size_prune` x the size predicted at either
        corner is pruned — the data-free replacement for the `max_box_size`
        dataset prior: in crowded scenes, cross-cell ghost pairs span many
        cell widths while the corner peaks themselves predict one cell's
        size, so the gate kills them regardless of their graph support.

    Returns:
      Boxes with `cfg.max_detections` rows, score-descending, NOT yet
      NMS-deduplicated (run `ops.nms.box_nms` on the result).
    """
    tl_s, br_s = peaks.scores[KP_TL], peaks.scores[KP_BR]         # [K]
    tl, br = peaks.coords[KP_TL], peaks.coords[KP_BR]             # [K, 2]

    # --- all-pairs candidate geometry: i indexes TL, j indexes BR ---------
    dx = br[None, :, 0] - tl[:, None, 0]                          # [K, K]
    dy = br[None, :, 1] - tl[:, None, 1]
    geom_ok = (
        (dx >= cfg.min_box_size)
        & (dy >= cfg.min_box_size)
        & (dx <= cfg.max_box_size)
        & (dy <= cfg.max_box_size)
        & (tl_s[:, None] > cfg.kp_score_thresh)
        & (br_s[None, :] > cfg.kp_score_thresh)
    )
    if kp_wh is not None and cfg.size_prune > 0:
        wh_tl = kp_wh[KP_TL].astype(jnp.float32)                  # [K, 2]
        wh_br = kp_wh[KP_BR].astype(jnp.float32)
        # the more permissive corner decides (max), with a 1-stride-px floor
        # so noisy near-zero predictions can't veto legitimately tiny boxes
        pw = jnp.maximum(jnp.maximum(wh_tl[:, None, 0], wh_br[None, :, 0]),
                         1.0)
        ph = jnp.maximum(jnp.maximum(wh_tl[:, None, 1], wh_br[None, :, 1]),
                         1.0)
        geom_ok = geom_ok & (dx <= cfg.size_prune * pw) \
                          & (dy <= cfg.size_prune * ph)
    diag = jnp.sqrt(dx * dx + dy * dy)

    # --- graph support from the other three keypoint classes -------------
    mid = 0.5 * (tl[:, None, :] + br[None, :, :])                 # [K, K, 2]
    center_sup = _nearest_support(
        mid, diag, peaks.coords[KP_CENTER], peaks.scores[KP_CENTER],
        cfg.center_thresh, cfg.center_tol,
    )
    exp_tr = jnp.stack(
        [jnp.broadcast_to(br[None, :, 0], dx.shape),
         jnp.broadcast_to(tl[:, None, 1], dx.shape)], axis=-1,
    )
    exp_bl = jnp.stack(
        [jnp.broadcast_to(tl[:, None, 0], dx.shape),
         jnp.broadcast_to(br[None, :, 1], dx.shape)], axis=-1,
    )
    tr_sup = _nearest_support(
        exp_tr, diag, peaks.coords[KP_TR], peaks.scores[KP_TR],
        cfg.kp_score_thresh, cfg.edge_tol,
    )
    bl_sup = _nearest_support(
        exp_bl, diag, peaks.coords[KP_BL], peaks.scores[KP_BL],
        cfg.kp_score_thresh, cfg.edge_tol,
    )

    # --- edge score: weighted mean of member keypoint scores --------------
    w_sum = cfg.w_corner + cfg.w_center + cfg.w_edge
    score = (
        cfg.w_corner * 0.5 * (tl_s[:, None] + br_s[None, :])
        + cfg.w_center * center_sup
        + cfg.w_edge * 0.5 * (tr_sup + bl_sup)
    ) / w_sum

    ok = geom_ok & (score > cfg.score_thresh)
    if cfg.require_center:
        ok = ok & (center_sup > 0.0)
    if cfg.require_edges:
        ok = ok & (tr_sup > 0.0) & (bl_sup > 0.0)

    # --- greedy matching: emit boxes by descending score, consuming each
    # TL / BR node at most once.  Tie order: score desc, then flat
    # (tl_idx * K + br_idx) asc — the determinism rule of SURVEY.md §7.3
    # item 2.
    #
    # Parallel-rounds formulation (round-2 perf: the previous
    # argmax+suppress `lax.scan` ran max_detections=128 *sequential* tiny
    # steps — pure latency).  Edges get a unique priority rank under
    # (score desc, flat index asc); each round simultaneously accepts every
    # edge whose rank is the minimum among live edges in BOTH its row and
    # its column, then kills those rows/columns.  A mutual row/col minimum
    # is exactly the edge sequential greedy would pick next (every edge
    # conflicting with it ranks worse, so greedy reaches it untouched), and
    # the global live minimum is always mutual, so each round accepts ≥ 1
    # edge and the fixpoint IS the sequential greedy matching — typically
    # in a handful of rounds instead of 128.
    k = tl.shape[0]
    big = jnp.int32(k * k)
    fidx = jnp.arange(k * k, dtype=jnp.int32).reshape(k, k)

    def alive_any(state):
        live, _ = state
        return jnp.any(live)

    def round_(state):
        live, kept = state                                # [K,K] bool each
        sc = jnp.where(live, score, -1.0)
        row_max = jnp.max(sc, axis=1, keepdims=True)      # [K, 1]
        col_max = jnp.max(sc, axis=0, keepdims=True)      # [1, K]
        # best live edge of each row/col under (score desc, flat idx asc):
        # min flat index among the max-score achievers
        row_arg = jnp.min(jnp.where(live & (sc == row_max), fidx, big),
                          axis=1, keepdims=True)
        col_arg = jnp.min(jnp.where(live & (sc == col_max), fidx, big),
                          axis=0, keepdims=True)
        new = live & (fidx == row_arg) & (fidx == col_arg)
        used_r = jnp.any(new, axis=1, keepdims=True)
        used_c = jnp.any(new, axis=0, keepdims=True)
        live = live & ~used_r & ~used_c
        return live, kept | new

    live0 = ok & (score > 0.0)
    _, kept = lax.while_loop(
        alive_any, round_, (live0, jnp.zeros((k, k), bool)))

    # ≤ 1 kept edge per row: reduce rows, then sort rows by (score desc,
    # row asc) — equal-score edges in distinct rows are already in flat
    # order — and keep the top max_detections (sequential greedy's first D
    # picks are the D best-ranked edges of the full matching).
    row_score = jnp.max(jnp.where(kept, score, -1.0), axis=1)     # [K]
    row_col = jnp.argmax(jnp.where(kept, score, -1.0), axis=1)    # [K]
    neg_s, ti, bj = lax.sort(
        (-row_score, jnp.arange(k, dtype=jnp.int32), row_col.astype(jnp.int32)),
        dimension=0, num_keys=2)
    d = cfg.max_detections
    top_scores, ti, bj = -neg_s[:d], ti[:d], bj[:d]
    boxes = jnp.stack(
        [tl[ti, 0], tl[ti, 1], br[bj, 0], br[bj, 1]], axis=-1,
    )
    valid = top_scores > 0.0
    return Boxes(boxes=boxes, scores=jnp.maximum(top_scores, 0.0), valid=valid)
