"""Host-side affine-consistent augmentation.  [SURVEY.md C3]

One affine matrix is sampled per image and applied jointly to the image
(bilinear) and the instance label map (nearest), so instance identity and
geometry stay consistent; GT boxes are *recomputed from the warped label map*
afterwards, which handles crop clipping and rotation exactly (no box-corner
approximation).
"""

from __future__ import annotations

import cv2
import numpy as np


def random_affine_params(rng: np.random.Generator, out_size: int,
                         src_hw: tuple[int, int],
                         scale_range=(0.8, 1.2), rotate_deg: float = 0.0,
                         flip_prob: float = 0.5) -> np.ndarray:
    """Sample a 2x3 affine mapping src image → out_size canvas."""
    sh, sw = src_hw
    base = out_size / max(sh, sw)                    # fit the long side
    scale = base * rng.uniform(*scale_range)
    ang = rng.uniform(-rotate_deg, rotate_deg) if rotate_deg > 0 else 0.0
    flip = rng.uniform() < flip_prob

    m = cv2.getRotationMatrix2D((sw / 2, sh / 2), ang, scale)
    # translate src center → random point near out center (random crop jitter)
    cx_src = m[0, 0] * (sw / 2) + m[0, 1] * (sh / 2) + m[0, 2]
    cy_src = m[1, 0] * (sw / 2) + m[1, 1] * (sh / 2) + m[1, 2]
    jitter = 0.1 * out_size
    tx = out_size / 2 + rng.uniform(-jitter, jitter) - cx_src
    ty = out_size / 2 + rng.uniform(-jitter, jitter) - cy_src
    m[0, 2] += tx
    m[1, 2] += ty
    if flip:
        # proper horizontal flip about the output center
        f = np.array([[-1.0, 0.0, out_size], [0.0, 1.0, 0.0]])
        m3 = np.vstack([m, [0, 0, 1]])
        m = (np.vstack([f, [0, 0, 1]]) @ m3)[:2]
    return m


def apply_affine(sample: dict, m: np.ndarray, out_size: int,
                 color_jitter: float = 0.0,
                 rng: np.random.Generator | None = None) -> dict:
    """Warp image + label map with the shared affine; optional color jitter."""
    img = cv2.warpAffine(
        sample["image"], m, (out_size, out_size), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    # nearest warp on uint16 ids: label maps carry ≤ max_instances (≤ 2^16)
    # ids, and the f32 round-trip cost two full-map conversion passes per
    # sample on the 1-core host (round-2 input-pipeline profile)
    lab = sample["label_map"]
    if lab.max() < 2 ** 16:
        label = cv2.warpAffine(
            lab.astype(np.uint16), m, (out_size, out_size),
            flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
            borderValue=0).astype(np.int32)
    else:
        label = cv2.warpAffine(
            lab.astype(np.float32), m, (out_size, out_size),
            flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
            borderValue=0).astype(np.int32)
    if color_jitter > 0 and rng is not None:
        gain = rng.uniform(1 - color_jitter, 1 + color_jitter, 3)
        bias = rng.uniform(-color_jitter, color_jitter, 3) * 30
        img = np.clip(img.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)
    out = dict(sample)
    out["image"], out["label_map"] = img, label
    return out


def random_elastic_field(rng: np.random.Generator, out_size: int,
                         alpha: float, sigma: float) -> np.ndarray:
    """Smooth random displacement field [H, W, 2] in pixels (Simard 2003,
    the classic medical/cell-segmentation augmentation): ±1 noise sampled
    every ~`sigma` px, bicubic-upsampled to the canvas, scaled by `alpha`
    (≈ the max displacement magnitude in px; bicubic interpolation can
    overshoot it by ~10-15%)."""
    g = max(int(np.ceil(out_size / max(sigma, 1.0))) + 1, 2)
    field = rng.uniform(-1.0, 1.0, (g, g, 2)).astype(np.float32)
    return cv2.resize(field, (out_size, out_size),
                      interpolation=cv2.INTER_CUBIC) * alpha


def apply_elastic(sample: dict, field: np.ndarray) -> dict:
    """Warp image (bilinear) + label map (nearest) by the shared field;
    instance identity stays consistent and GT boxes are recomputed from the
    warped label map downstream, exactly as for the affine."""
    h, w = sample["label_map"].shape
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    mapx = xs + field[..., 0]
    mapy = ys + field[..., 1]
    img = cv2.remap(sample["image"], mapx, mapy, cv2.INTER_LINEAR,
                    borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    lab = sample["label_map"]
    if lab.max() < 2 ** 16:     # same uint16 fast path as apply_affine
        label = cv2.remap(lab.astype(np.uint16), mapx, mapy,
                          cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
                          borderValue=0).astype(np.int32)
    else:
        label = cv2.remap(lab.astype(np.float32), mapx, mapy,
                          cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
                          borderValue=0).astype(np.int32)
    out = dict(sample)
    out["image"], out["label_map"] = img, label
    return out


def resize_sample(sample: dict, out_size: int) -> dict:
    """Deterministic letterbox-free resize to out_size² (eval path)."""
    sh, sw = sample["label_map"].shape
    scale = out_size / max(sh, sw)
    m = np.array([[scale, 0.0, 0.0], [0.0, scale, 0.0]])
    return apply_affine(sample, m, out_size)


def boxes_from_label_map(label: np.ndarray, max_instances: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Boxes (x0,y0,x1,y1) per instance id, area-ranked, padded to N.

    Returns (boxes [N,4] f32, valid [N] f32, remap [N] int32) where remap[i]
    is the original label id of padded slot i (0 for padding) — used to
    renumber the label map so id i+1 ↔ slot i.

    Uses the native single-pass C++ op when available (one O(H·W) sweep vs
    NumPy's per-id nonzero scans — SURVEY.md §2.9, kgtpu/native).
    """
    from kgtpu import native
    out = native.boxes_from_label_map(label, max_instances)
    if out is not None:
        return out
    n = max_instances
    ids = np.unique(label)
    ids = ids[ids > 0]
    rows = []
    for i in ids:
        ys, xs = np.nonzero(label == i)
        if len(xs) < 4:               # clipped-away slivers
            continue
        rows.append((float(len(xs)), i,
                     float(xs.min()), float(ys.min()),
                     float(xs.max() + 1), float(ys.max() + 1)))
    # biggest instances survive truncation; ties break id-ascending (matches
    # the native op)
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:n]

    boxes = np.zeros((n, 4), np.float32)
    valid = np.zeros((n,), np.float32)
    remap = np.zeros((n,), np.int32)
    for slot, (_, i, x0, y0, x1, y1) in enumerate(rows):
        boxes[slot] = (x0, y0, x1, y1)
        valid[slot] = 1.0
        remap[slot] = i
    return boxes, valid, remap


def renumber_label_map(label: np.ndarray, remap: np.ndarray) -> np.ndarray:
    """Renumber label ids so slot i's instance has id i+1 (0 stays bg)."""
    from kgtpu import native
    out = native.renumber_label_map(label, remap)
    if out is not None:
        return out
    out = np.zeros_like(label)
    for slot, orig in enumerate(remap):
        if orig > 0:
            out[label == orig] = slot + 1
    return out
