"""Losses: penalty-reduced focal + offset L1 + mask BCE/dice.  [SURVEY.md C8]

All losses are computed from *coordinates*, not dense sparse-target maps: the
offset/wh losses gather head predictions at the (floored) GT keypoint pixels
on device, so the batch never carries dense regression targets — only the
heatmaps are rendered (by ops.targets, also on device, inside the train step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(hm_logits: jnp.ndarray, hm_targets: jnp.ndarray,
               alpha: float = 2.0, beta: float = 4.0) -> jnp.ndarray:
    """CornerNet penalty-reduced pixelwise focal loss.

    Args:
      hm_logits: [..., H, W, C] raw head output.
      hm_targets: [..., H, W, C] rendered Gaussians in [0, 1]; exactly 1.0 at
        keypoint pixels.

    Returns: scalar, normalized by the number of positive pixels.
    """
    p = jax.nn.sigmoid(hm_logits.astype(jnp.float32))
    t = hm_targets.astype(jnp.float32)
    pos = (t >= 1.0).astype(jnp.float32)

    # numerically-stable log-sigmoid forms
    log_p = jax.nn.log_sigmoid(hm_logits)
    log_1p = jax.nn.log_sigmoid(-hm_logits)

    pos_loss = -((1.0 - p) ** alpha) * log_p * pos
    neg_loss = -((1.0 - t) ** beta) * (p ** alpha) * log_1p * (1.0 - pos)
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos


def _gather_at(pred_map: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather pred_map [H, W, C] at integer pixel coords xy [..., 2] (x, y)."""
    h, w, c = pred_map.shape
    xi = jnp.clip(xy[..., 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(xy[..., 1].astype(jnp.int32), 0, h - 1)
    return jnp.take(pred_map.reshape(h * w, c), yi * w + xi, axis=0)


def offset_loss(reg: jnp.ndarray, kpts: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """L1 between predicted sub-pixel offsets and fractional keypoint parts.

    Args:
      reg: [H, W, 2] offset head output (single image).
      kpts: [N, C, 2] GT keypoints (x, y) in stride coords (float).
      valid: [N] instance validity.

    Returns: scalar mean L1 over valid keypoints.
    """
    h, w, _ = reg.shape
    ikpts = jnp.floor(kpts)
    frac = kpts - ikpts                                   # [N, C, 2] targets
    pred = _gather_at(reg.astype(jnp.float32), ikpts)     # [N, C, 2]
    inb = (
        (ikpts[..., 0] >= 0) & (ikpts[..., 0] < w)
        & (ikpts[..., 1] >= 0) & (ikpts[..., 1] < h)
    )
    m = (valid[:, None] > 0) & inb                        # [N, C]
    l1 = jnp.sum(jnp.abs(pred - frac), axis=-1)           # [N, C]
    return jnp.sum(l1 * m) / jnp.maximum(jnp.sum(m), 1.0)


def wh_loss(wh: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """L1 on box (w, h) gathered at ALL 5 keypoint pixels (OPEN-2 head).

    Corner supervision matters, not just center: the keypoint-graph grouper
    prunes (TL, BR) pairs by the size predicted AT THE CORNER PEAKS
    (`GroupConfig.size_prune`), so the head must be accurate there — it is
    what replaces the hand-tuned dataset `max_box_size` prior in crowded
    scenes.  The centernet decode path reads the center pixel, also covered.
    """
    from kgtpu.ops.targets import keypoints_from_boxes

    h, w, _ = wh.shape
    kpts = keypoints_from_boxes(boxes)                    # [N, 5, 2]
    ikpts = jnp.floor(kpts)
    pred = _gather_at(wh.astype(jnp.float32), ikpts)      # [N, 5, 2]
    target = jnp.stack(
        [boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]],
        axis=-1)[:, None, :]                              # [N, 1, 2]
    inb = (
        (ikpts[..., 0] >= 0) & (ikpts[..., 0] < w)
        & (ikpts[..., 1] >= 0) & (ikpts[..., 1] < h)
    )                                                     # [N, 5]
    m = (valid[:, None] > 0) & inb
    l1 = jnp.sum(jnp.abs(pred - target), axis=-1)         # [N, 5]
    return jnp.sum(l1 * m) / jnp.maximum(jnp.sum(m), 1.0)


def mask_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              valid: jnp.ndarray, dice_weight: float = 1.0) -> jnp.ndarray:
    """BCE + dice over per-instance mask crops.

    Args:
      logits: [N, m, m] mask-head output for GT boxes.
      targets: [N, m, m] binary GT crops.
      valid: [N] instance validity.
    """
    t = targets.astype(jnp.float32)
    lg = logits.astype(jnp.float32)
    bce = -(t * jax.nn.log_sigmoid(lg) + (1 - t) * jax.nn.log_sigmoid(-lg))
    bce = jnp.mean(bce, axis=(1, 2))                      # [N]

    p = jax.nn.sigmoid(lg)
    inter = jnp.sum(p * t, axis=(1, 2))
    denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(t, axis=(1, 2))
    dice = 1.0 - (2.0 * inter + 1.0) / (denom + 1.0)      # [N]

    m = (valid > 0).astype(jnp.float32)
    per = bce + dice_weight * dice
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
