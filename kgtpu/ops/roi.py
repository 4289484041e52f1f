"""ROI crop / mask paste as separable-matmul resampling.  [SURVEY.md C12-C13]

The reference crops each detected box on the host (cv2/interpolate) and
pastes predicted masks back with per-box NumPy loops — crossing the device
boundary O(#boxes) times per image (SURVEY.md §3.2).  The first TPU port of
this used per-pixel bilinear *gathers*; profiling showed the paste scan at
~990 ms/img on a v5e — gathers are the anti-pattern on TPU.

The TPU-native formulation: 2-D bilinear interpolation is separable, so a
resample is two small matrix products with banded tent-weight matrices,

    crop[j, i]  = Σ_y Σ_x  Wy[j, y] · img[y, x] · Wx[i, x]
    paste[y, x] = Σ_j Σ_i  Py[y, j] · mask[j, i] · Px[x, i]

which run on the MXU (the profiled paste drops to ~MXU-noise).  Weight
matrices are built from iota math per box; everything stays fixed-shape.

Sampling convention (OPEN-10 resolution): half-pixel centers, cv2-style.
Boxes live in continuous image coordinates where pixel `i` spans [i, i+1)
with center i+0.5.  Crop output pixel `j` of `R` samples the source at
    X = x0 + (j + 0.5) * (x1 - x0) / R
with edge clamping, and paste inverts that mapping exactly, so crop∘paste
is identity up to bilinear blur (SURVEY.md §7.3 item 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _crop_weights(start: jnp.ndarray, extent: jnp.ndarray, r: int,
                  n_src: int) -> jnp.ndarray:
    """[r, n_src] bilinear weights: crop texel j ← source pixels.

    Row j is a tent of width 1 centered at clamp(start + (j+.5)·extent/r − .5,
    0, n_src−1) — the clamp reproduces gather-style edge duplication.
    """
    j = jnp.arange(r, dtype=jnp.float32)
    pos = start + (j + 0.5) * extent / r - 0.5            # [r]
    pos = jnp.clip(pos, 0.0, n_src - 1.0)
    src = jnp.arange(n_src, dtype=jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(pos[:, None] - src[None, :]), 0.0)


def _nearest_weights(start: jnp.ndarray, extent: jnp.ndarray, r: int,
                     n_src: int) -> jnp.ndarray:
    """[r, n_src] one-hot rows: exact nearest-neighbor resample as a matmul
    (each row selects floor(start + (j+.5)·extent/r) clamped) — label ids
    pass through a one-hot matmul exactly, and the MXU replaces the gather
    that cost ~20 ms/batch32 in the train step's GT-mask crop."""
    j = jnp.arange(r, dtype=jnp.float32)
    pos = start + (j + 0.5) * extent / r
    idx = jnp.clip(jnp.floor(pos), 0.0, n_src - 1.0)
    src = jnp.arange(n_src, dtype=jnp.float32)
    return (src[None, :] == idx[:, None]).astype(jnp.float32)


def _paste_weights(start: jnp.ndarray, extent: jnp.ndarray, r: int,
                   n_out: int) -> jnp.ndarray:
    """[n_out, r] bilinear weights: image pixel y ← mask texels.

    Pixel centers outside the box get an all-zero row (the old `inside`
    mask); positions inside are clamped to the mask's texel-center range.
    """
    y = jnp.arange(n_out, dtype=jnp.float32) + 0.5        # pixel centers
    mx = (y - start) / jnp.maximum(extent, 1e-6) * r      # continuous mask pos
    inside = (mx >= 0.0) & (mx <= r)
    pos = jnp.clip(mx - 0.5, 0.0, r - 1.0)
    tex = jnp.arange(r, dtype=jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(pos[:, None] - tex[None, :]), 0.0)
    return w * inside[:, None]


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
      method: "bilinear" (separable matmul, MXU) or "nearest" (gather —
        label maps, ids must not be blended).

    Returns:
      [D, R, R, C] crops; degenerate boxes produce edge-clamped garbage and
      must be masked by the caller's validity mask.
    """
    h, w, _ = img.shape
    r = out_size
    weights = _nearest_weights if method == "nearest" else _crop_weights
    # bf16 sources (the backbone feature maps) stay bf16 through the matmuls
    # so the MXU runs at its bf16 rate (the crop is ~21 GFLOP/img at the
    # flagship shapes — 1/3 of the profiled mask-stage FLOPs); accumulation
    # is f32 via preferred_element_type.  Everything else (GT label maps,
    # f32 images, the cv2-parity tests) keeps the exact f32 path.
    cd = jnp.bfloat16 if img.dtype == jnp.bfloat16 else jnp.float32

    def one(box):
        wy = weights(box[1], box[3] - box[1], r, h)             # [r, H]
        wx = weights(box[0], box[2] - box[0], r, w)             # [r, W]
        tmp = jnp.einsum("jy,yxc->jxc", wy.astype(cd), img.astype(cd),
                         preferred_element_type=jnp.float32)
        return jnp.einsum("ix,jxc->jic", wx.astype(cd), tmp.astype(cd),
                          preferred_element_type=jnp.float32)

    return jax.vmap(one)(boxes.astype(jnp.float32)).astype(img.dtype)


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    thresh: float = 0.5,
    box_chunk: int = 8,
    id_base: int | jnp.ndarray = 0,
    init: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Paste per-box mask probabilities into a full-resolution instance map.

    Overlaps resolve by score: each pixel is assigned to the highest-scoring
    instance whose (thresholded) mask covers it — the device-native form of
    the reference's "resolve overlaps" paste loop [SURVEY.md C13].  Boxes are
    processed `box_chunk` at a time under `lax.scan` (a [chunk, H, W]
    intermediate instead of [D, H, W]).

    Args:
      masks: [D, r, r] mask probabilities in the box frame.
      boxes: [D, 4] in image continuous coords.
      scores: [D]; valid: [D] bool.
      height, width: output resolution (static).
      thresh: foreground threshold.
      id_base: instance d is written as id_base + d + 1 (tiled inference
        stitches several paste passes with disjoint id ranges).
      init: optional (label_map, score_map) carry to paste on top of.

    Returns:
      (label_map [H, W] int32 with 0 = background and id_base+d+1 = instance d,
       score_map [H, W] float32 of the winning instance's score).
    """
    d, r, _ = masks.shape
    pad = (-d) % box_chunk
    if pad:
        masks = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, pad),))
        valid = jnp.pad(valid, ((0, pad),))
    n_chunks = masks.shape[0] // box_chunk

    masks_c = masks.reshape(n_chunks, box_chunk, r, r).astype(jnp.float32)
    boxes_c = boxes.reshape(n_chunks, box_chunk, 4).astype(jnp.float32)
    scores_c = scores.reshape(n_chunks, box_chunk).astype(jnp.float32)
    valid_c = valid.reshape(n_chunks, box_chunk)
    base_c = (jnp.arange(n_chunks, dtype=jnp.int32) * box_chunk
              + jnp.asarray(id_base, jnp.int32))

    def step(carry, inp):
        label, best = carry
        mask, box, score, v, base = inp
        py = jax.vmap(
            lambda b: _paste_weights(b[1], b[3] - b[1], r, height))(box)
        px = jax.vmap(
            lambda b: _paste_weights(b[0], b[2] - b[0], r, width))(box)
        tmp = jnp.einsum("chr,crs->chs", py, mask,
                         preferred_element_type=jnp.float32)
        vals = jnp.einsum("chs,cws->chw", tmp, px,
                          preferred_element_type=jnp.float32)   # [chunk, H, W]
        fg = (vals > thresh) & v[:, None, None]
        cand_score = jnp.where(fg, score[:, None, None], -1.0)  # [chunk,H,W]
        winner = jnp.argmax(cand_score, axis=0).astype(jnp.int32)  # [H, W]
        win_score = jnp.max(cand_score, axis=0)
        # chunk ids are consecutive: winner's global id is arithmetic — a
        # jnp.take gather here cost ~100 ms/step on the v5e.
        win_id = base + winner + 1
        better = (win_score > 0) & (win_score > best)
        label = jnp.where(better, win_id, label)
        best = jnp.where(better, win_score, best)
        return (label, best), None

    carry0 = init if init is not None else (
        jnp.zeros((height, width), jnp.int32),
        jnp.zeros((height, width), jnp.float32),
    )
    (label, best), _ = jax.lax.scan(
        step, carry0, (masks_c, boxes_c, scores_c, valid_c, base_c))
    return label, best


def paste_masks_batch(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    thresh: float = 0.5,
    box_chunk: int = 32,
    id_base: int | jnp.ndarray = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched paste_masks with whole-batch chunk skipping.

    Semantically identical to `vmap(paste_masks)` (same score-priority
    resolve, same lowest-index tie-break), but the scan over detection-slot
    chunks runs at BATCH level, so a chunk whose slots hold no valid
    detection in ANY image is skipped with a scalar-predicate lax.cond —
    real control flow, unlike a per-image cond under vmap, which XLA turns
    into a select that computes both branches.  With box_nms's kept-first
    compaction the valid slots form a prefix and most chunks skip (the
    roofline measured the vmapped paste at 5% of its HBM bound — pure
    sequential-latency overhead).

    Args mirror paste_masks with a leading batch axis: masks [B, D, r, r],
    boxes [B, D, 4] (image continuous coords), scores/valid [B, D];
    id_base is a scalar or per-image [B] offset (instance d of image i is
    written as id_base[i] + d + 1 — the tiled path passes tile_idx·D).
    Returns (label_map [B, H, W] int32, score_map [B, H, W] float32).
    """
    b, d, r, _ = masks.shape
    pad = (-d) % box_chunk
    if pad:
        masks = jnp.pad(masks, ((0, 0), (0, pad), (0, 0), (0, 0)))
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    n_chunks = masks.shape[1] // box_chunk

    def chunked(x):
        return jnp.moveaxis(
            x.reshape((b, n_chunks, box_chunk) + x.shape[2:]), 1, 0)

    masks_c = chunked(masks.astype(jnp.float32))   # [C, B, ch, r, r]
    boxes_c = chunked(boxes.astype(jnp.float32))
    scores_c = chunked(scores.astype(jnp.float32))
    valid_c = chunked(valid)
    base_c = jnp.arange(n_chunks, dtype=jnp.int32) * box_chunk
    img_base = jnp.broadcast_to(
        jnp.asarray(id_base, jnp.int32), (b,))[:, None, None]  # [B, 1, 1]

    def step(carry, inp):
        mask, box, score, v, base = inp

        def compute():
            label, best = carry
            flat_box = box.reshape(b * box_chunk, 4)
            py = jax.vmap(
                lambda bx: _paste_weights(bx[1], bx[3] - bx[1], r, height)
            )(flat_box).reshape(b, box_chunk, height, r)
            px = jax.vmap(
                lambda bx: _paste_weights(bx[0], bx[2] - bx[0], r, width)
            )(flat_box).reshape(b, box_chunk, width, r)
            tmp = jnp.einsum("bchr,bcrs->bchs", py, mask,
                             preferred_element_type=jnp.float32)
            vals = jnp.einsum("bchs,bcws->bchw", tmp, px,
                              preferred_element_type=jnp.float32)
            fg = (vals > thresh) & v[:, :, None, None]
            cand = jnp.where(fg, score[:, :, None, None], -1.0)
            winner = jnp.argmax(cand, axis=1).astype(jnp.int32)   # [B, H, W]
            win_score = jnp.max(cand, axis=1)
            win_id = img_base + base + winner + 1
            better = (win_score > 0) & (win_score > best)
            return (jnp.where(better, win_id, label),
                    jnp.where(better, win_score, best))

        return jax.lax.cond(jnp.any(v), compute, lambda: carry), None

    carry0 = (jnp.zeros((b, height, width), jnp.int32),
              jnp.zeros((b, height, width), jnp.float32))
    (label, best), _ = jax.lax.scan(
        step, carry0, (masks_c, boxes_c, scores_c, valid_c, base_c))
    return label, best
