"""Whole-slide sliding-window tiling with on-device stitching.
[SURVEY.md §2.10 "spatial tiling", §5 long-context analogue; BASELINE config 5]

The reference handles large images with host-side sliding-window loops; here
the tile grid is static (derived from image shape + tile size + overlap), the
tiles are batched through the detector in one program, and stitching is a
device-side scan — so a whole slide becomes one jitted call.

Duplicate suppression across tiles uses *ownership*: each tile owns the
region more than overlap/2 inside its core (extended to the image border for
edge tiles); a detection whose center falls outside its tile's owned region
is dropped, so every object is reported by exactly one tile (the overlap must
exceed the largest object diameter for this to be loss-free — the standard
sliding-window contract).  Cross-tile stitching then needs no global NMS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.ops.group import Boxes


def tile_grid(height: int, width: int, tile: int, overlap: int
              ) -> np.ndarray:
    """Static [T, 2] array of (oy, ox) tile origins covering the image.

    Stride = tile - overlap; the last tile in each axis is clamped so it ends
    exactly at the image border (tiles may overlap more there).
    """
    assert tile <= height and tile <= width, "image smaller than tile"
    stride = tile - overlap
    ys = list(range(0, max(height - tile, 0) + 1, stride))
    if ys[-1] != height - tile:
        ys.append(height - tile)
    xs = list(range(0, max(width - tile, 0) + 1, stride))
    if xs[-1] != width - tile:
        xs.append(width - tile)
    return np.asarray([(y, x) for y in ys for x in xs], np.int32)


def extract_tiles(image: jnp.ndarray, origins: jnp.ndarray, tile: int
                  ) -> jnp.ndarray:
    """image [H, W, C], origins [T, 2] (oy, ox) → [T, tile, tile, C]."""

    def one(o):
        return jax.lax.dynamic_slice(
            image, (o[0], o[1], 0), (tile, tile, image.shape[-1]))

    return jax.vmap(one)(origins)


def ownership_mask(dets: Boxes, origin: jnp.ndarray, tile: int, overlap: int,
                   height: int, width: int) -> jnp.ndarray:
    """[D] bool: detection centers inside this tile's owned region.

    Coordinates of `dets` are tile-local pixels.  The owned region is
    [overlap/2, tile - overlap/2) in each axis, extended to the image edge
    when the tile touches it.
    """
    cy = (dets.boxes[:, 1] + dets.boxes[:, 3]) * 0.5
    cx = (dets.boxes[:, 0] + dets.boxes[:, 2]) * 0.5
    half = overlap / 2.0
    oy, ox = origin[0], origin[1]

    lo_y = jnp.where(oy == 0, -jnp.inf, half)
    hi_y = jnp.where(oy + tile >= height, jnp.inf, tile - half)
    lo_x = jnp.where(ox == 0, -jnp.inf, half)
    hi_x = jnp.where(ox + tile >= width, jnp.inf, tile - half)
    return ((cy >= lo_y) & (cy < hi_y) & (cx >= lo_x) & (cx < hi_x)
            & dets.valid)


def stitch_tiles(local_labels: jnp.ndarray, local_scores: jnp.ndarray,
                 origins: jnp.ndarray, height: int, width: int
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge per-tile (label, score) canvases into the global frame.

    local_labels [T, ts, ts] int32 (globally unique ids or 0),
    local_scores [T, ts, ts] float32.  Overlapping pixels resolve by score.
    """
    ts = local_labels.shape[1]

    def step(carry, inp):
        g_label, g_score = carry
        lab, sc, o = inp
        cur_l = jax.lax.dynamic_slice(g_label, (o[0], o[1]), (ts, ts))
        cur_s = jax.lax.dynamic_slice(g_score, (o[0], o[1]), (ts, ts))
        better = sc > cur_s
        new_l = jnp.where(better, lab, cur_l)
        new_s = jnp.where(better, sc, cur_s)
        g_label = jax.lax.dynamic_update_slice(g_label, new_l, (o[0], o[1]))
        g_score = jax.lax.dynamic_update_slice(g_score, new_s, (o[0], o[1]))
        return (g_label, g_score), None

    init = (jnp.zeros((height, width), jnp.int32),
            jnp.zeros((height, width), jnp.float32))
    (label, score), _ = jax.lax.scan(
        step, init, (local_labels, local_scores, origins))
    return label, score
