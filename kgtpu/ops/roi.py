"""ROI crop / mask paste as fixed-shape device gathers.  [SURVEY.md C12-C13]

The reference crops each detected box on the host (cv2/interpolate) and
pastes predicted masks back with per-box NumPy loops — crossing the device
boundary O(#boxes) times per image (SURVEY.md §3.2).  Here both directions
are bilinear gather programs over a *fixed* box count, so the two-stage
inference path stays on device end to end.

Sampling convention (OPEN-10 resolution): half-pixel centers, cv2-style.
Boxes live in continuous image coordinates where pixel `i` spans [i, i+1)
with center i+0.5.  Crop output pixel `j` of `R` samples the source at
    X = x0 + (j + 0.5) * (x1 - x0) / R
and paste inverts that mapping exactly, so crop∘paste is identity up to
bilinear blur.  Getting this pair consistent is SURVEY.md §7.3 item 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Sample img [H, W, C] at continuous positions (xs, ys) [..., ] with
    half-pixel centers and edge clamping.  Returns [..., C]."""
    h, w, _ = img.shape
    tx = xs - 0.5                       # continuous pos → pixel-center frame
    ty = ys - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    flat = img.reshape(h * w, -1)
    g = lambda yi, xi: jnp.take(flat, yi * w + xi, axis=0)
    v00, v01 = g(y0i, x0i), g(y0i, x1i)
    v10, v11 = g(y1i, x0i), g(y1i, x1i)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def crop_and_resize(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int,
    method: str = "bilinear",
) -> jnp.ndarray:
    """Crop each box and resize to [out_size, out_size].

    Args:
      img: [H, W, C] source (image or feature map).
      boxes: [D, 4] (x0, y0, x1, y1) in `img`'s continuous pixel coords.
      out_size: static output resolution R.
      method: "bilinear" (features/images) or "nearest" (label maps — ids
        must not be blended).

    Returns:
      [D, R, R, C] crops; degenerate boxes produce edge-clamped garbage and
      must be masked by the caller's validity mask.
    """
    r = out_size
    grid = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r          # [R]

    def one(box):
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        xs = x0 + grid[None, :] * (x1 - x0)                       # [R, R]
        ys = y0 + grid[:, None] * (y1 - y0)
        if method == "nearest":
            h, w, _ = img.shape
            xi = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
            return jnp.take(img.reshape(h * w, -1), yi * w + xi, axis=0)
        return _bilinear_gather(img, jnp.broadcast_to(xs, (r, r)),
                                jnp.broadcast_to(ys, (r, r)))

    return jax.vmap(one)(boxes)


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    thresh: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Paste per-box mask probabilities into a full-resolution instance map.

    Overlaps resolve by score: each pixel is assigned to the highest-scoring
    instance whose (thresholded) mask covers it — the device-native form of
    the reference's "resolve overlaps" paste loop [SURVEY.md C13].  Runs as a
    `lax.scan` over the box axis so the [D, H, W] stack is never
    materialized.

    Args:
      masks: [D, r, r] mask probabilities in the box frame.
      boxes: [D, 4] in image continuous coords.
      scores: [D]; valid: [D] bool.
      height, width: output resolution (static).
      thresh: foreground threshold.

    Returns:
      (label_map [H, W] int32 with 0 = background and d+1 = instance d,
       score_map [H, W] float32 of the winning instance's score).
    """
    r = masks.shape[-1]
    ximg = jnp.arange(width, dtype=jnp.float32) + 0.5             # pixel centers
    yimg = jnp.arange(height, dtype=jnp.float32) + 0.5

    def step(carry, inp):
        label, best = carry
        mask, box, score, v, d = inp
        x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x1 - x0, 1e-6)
        bh = jnp.maximum(y1 - y0, 1e-6)
        # image pixel center → continuous mask coordinate (inverse of crop)
        mx = (ximg[None, :] - x0) / bw * r                        # [1, W]
        my = (yimg[:, None] - y0) / bh * r                        # [H, 1]
        inside = (mx >= 0) & (mx <= r) & (my >= 0) & (my <= r)
        val = _bilinear_gather(
            mask[..., None],
            jnp.broadcast_to(mx, (height, width)),
            jnp.broadcast_to(my, (height, width)),
        )[..., 0]
        fg = inside & (val > thresh) & v & (score > best)
        label = jnp.where(fg, d + 1, label)
        best = jnp.where(fg, score, best)
        return (label, best), None

    d = masks.shape[0]
    init = (
        jnp.zeros((height, width), jnp.int32),
        jnp.zeros((height, width), jnp.float32),
    )
    (label, best), _ = jax.lax.scan(
        step, init,
        (masks.astype(jnp.float32), boxes.astype(jnp.float32),
         scores.astype(jnp.float32), valid, jnp.arange(d, dtype=jnp.int32)),
    )
    return label, best
