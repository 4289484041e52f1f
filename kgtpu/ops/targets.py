"""On-device Gaussian heatmap target rendering.  [SURVEY.md C4]

The reference renders training targets with per-instance host NumPy loops
inside DataLoader workers (SURVEY.md §3.4, "hot host loop #1").  Here the
renderer is a fixed-shape jax op that runs *inside the jitted train step*:
the batch carries only keypoint coordinates + validity, and the [C,H,W]
heatmaps are produced on device as a max-reduction of per-instance Gaussian
splats, computed by a `lax.scan` over the (padded) instance axis so the
[N,C,H,W] broadcast is never materialized (SURVEY.md §7.3 item 3).

Semantics match the CornerNet/CenterNet lineage the reference descends from:
  * radius from `gaussian_radius((h, w), min_overlap)` (CornerNet formula);
  * the splat is centered on the *floored* integer keypoint pixel — the
    fractional part is the offset head's target, not the heatmap's;
  * splat `exp(-(dx²+dy²)/(2σ²))` with `σ = (2·floor(r)+1)/6`;
  * overlapping splats combine with elementwise max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kgtpu.config import NUM_KP_CLASSES


def gaussian_radius(size_hw: jnp.ndarray, min_overlap: float = 0.7) -> jnp.ndarray:
    """CornerNet gaussian radius: largest r s.t. a corner displaced by r still
    yields a box with IoU >= min_overlap against the GT box.

    Args:
      size_hw: [..., 2] box (height, width) in output-stride pixels.
      min_overlap: IoU the displaced box must retain.

    Returns:
      [...] float radius, clamped to >= 0.
    """
    h, w = size_hw[..., 0], size_hw[..., 1]

    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1.0 - min_overlap) / (1.0 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4.0 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2.0 * a1)

    a2 = 4.0
    b2 = 2.0 * (h + w)
    c2 = (1.0 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 4.0 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2.0 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (h + w)
    c3 = (min_overlap - 1.0) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4.0 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2.0 * a3)

    return jnp.maximum(jnp.minimum(jnp.minimum(r1, r2), r3), 0.0)


def keypoints_from_boxes(boxes: jnp.ndarray) -> jnp.ndarray:
    """Derive the 5 keypoint classes from boxes (OPEN-1 resolution).

    Args:
      boxes: [..., 4] as (x0, y0, x1, y1).

    Returns:
      [..., 5, 2] keypoints as (x, y), ordered TL, TR, BL, BR, CENTER.
    """
    x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
    cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
    return jnp.stack(
        [
            jnp.stack([x0, y0], axis=-1),
            jnp.stack([x1, y0], axis=-1),
            jnp.stack([x0, y1], axis=-1),
            jnp.stack([x1, y1], axis=-1),
            jnp.stack([cx, cy], axis=-1),
        ],
        axis=-2,
    )


def render_heatmaps(
    kpts: jnp.ndarray,
    sizes_hw: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    min_overlap: float = 0.7,
    instance_chunk: int = 8,
) -> jnp.ndarray:
    """Render [H, W, C] Gaussian keypoint heatmaps on device.

    Args:
      kpts: [N, C, 2] keypoints (x, y) in output-stride coordinates.
      sizes_hw: [N, 2] per-instance box (height, width), stride coords.
      valid: [N] bool/float instance validity mask (padding rows are 0).
      height, width: heatmap spatial shape (static).
      min_overlap: IoU used by the radius formula.
      instance_chunk: instances splatted per scan step; trades a small amount
        of peak memory ([chunk, C, H, W] intermediate) for fewer scan steps.

    Returns:
      [height, width, C] float32 heatmaps in [0, 1].
    """
    n, c, _ = kpts.shape
    kpts = jnp.floor(kpts)          # splat at integer pixels (see docstring)
    pad = (-n) % instance_chunk
    if pad:
        kpts = jnp.pad(kpts, ((0, pad), (0, 0), (0, 0)))
        sizes_hw = jnp.pad(sizes_hw, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))
    n_pad = kpts.shape[0]

    radius = gaussian_radius(sizes_hw, min_overlap)          # [N]
    # CornerNet draws a (2r+1)-diameter kernel with sigma = diameter / 6.
    sigma = (2.0 * jnp.floor(radius) + 1.0) / 6.0
    inv_two_sigma_sq = jnp.where(valid > 0, 1.0 / (2.0 * sigma * sigma + 1e-12), 0.0)

    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    kpts_c = kpts.reshape(n_pad // instance_chunk, instance_chunk, c, 2)
    coef_c = inv_two_sigma_sq.reshape(n_pad // instance_chunk, instance_chunk)
    valid_c = (valid > 0).reshape(n_pad // instance_chunk, instance_chunk)

    def step(hm, chunk):
        k, coef, v = chunk                                   # [m,C,2], [m], [m]
        dx = xs[None, None] - k[..., 0][..., None, None]     # [m, C, H, W]
        dy = ys[None, None] - k[..., 1][..., None, None]
        g = jnp.exp(-(dx * dx + dy * dy) * coef[:, None, None, None])
        g = jnp.where(v[:, None, None, None], g, 0.0)
        return jnp.maximum(hm, jnp.max(g, axis=0)), None

    init = jnp.zeros((c, height, width), jnp.float32)
    hm, _ = jax.lax.scan(step, init, (kpts_c, coef_c, valid_c))
    return jnp.transpose(hm, (1, 2, 0))                      # [H, W, C]


def render_heatmaps_batch(
    kpts: jnp.ndarray, sizes_hw: jnp.ndarray, valid: jnp.ndarray,
    height: int, width: int, min_overlap: float = 0.7,
) -> jnp.ndarray:
    """vmap of `render_heatmaps` over a leading batch axis."""
    fn = lambda k, s, v: render_heatmaps(k, s, v, height, width, min_overlap)
    return jax.vmap(fn)(kpts, sizes_hw, valid)
