"""Host-side NumPy oracle implementations of the pipeline ops.

Written fresh from the spec in SURVEY.md (the reference mount is empty —
these are NOT copies), in the naive loopy style the reference family
(CornerNet/CenterNet lineage) uses, so the vectorized jax ops in `kgtpu.ops`
can be asserted against them on randomized inputs ("golden-parity unit
tests", SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np


# --- C4: gaussian targets ---------------------------------------------------

def gaussian_radius(height: float, width: float, min_overlap: float = 0.7) -> float:
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(max(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(max(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(max(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return max(min(r1, r2, r3), 0.0)


def render_heatmaps(kpts, sizes_hw, valid, height, width, min_overlap=0.7):
    """kpts [N,C,2] (x,y); sizes_hw [N,2]; valid [N] → [H,W,C] float32.

    Unlike the classic windowed `draw_umich_gaussian`, the splat is evaluated
    on the full grid (the jax op does the same); values far from the center
    underflow to ~0 so the results agree to float tolerance.
    """
    n, c, _ = kpts.shape
    hm = np.zeros((height, width, c), np.float32)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    for i in range(n):
        if not valid[i]:
            continue
        r = gaussian_radius(sizes_hw[i, 0], sizes_hw[i, 1], min_overlap)
        sigma = (2 * np.floor(r) + 1) / 6.0
        for cc in range(c):
            x, y = np.floor(kpts[i, cc])   # splat at the integer pixel
            g = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma ** 2 + 1e-12))
            hm[:, :, cc] = np.maximum(hm[:, :, cc], g)
    return hm


# --- C9: peak decode --------------------------------------------------------

def decode_peaks(hm, reg, k, apply_sigmoid=True, window=3,
                 dedup_plateaus=True):
    """hm [H,W,C] logits, reg [H,W,2] or None → (scores [C,K], coords [C,K,2],
    idx [C,K]).  Naive loops; ties break by row-major index ascending.
    `dedup_plateaus`: among window-equal surviving maxima, only the lowest
    row-major index is kept (the op's default); False = reference behavior
    (every pixel equal to its window max survives)."""
    h, w, c = hm.shape
    prob = 1 / (1 + np.exp(-hm.astype(np.float64))) if apply_sigmoid else hm.astype(np.float64)
    pad = window // 2
    padded = np.pad(prob, ((pad, pad), (pad, pad), (0, 0)), constant_values=-np.inf)
    pooled = np.zeros_like(prob)
    for y in range(h):
        for x in range(w):
            pooled[y, x] = padded[y:y + window, x:x + window].max(axis=(0, 1))
    keep = prob == pooled
    if dedup_plateaus:
        # a survivor stays only if no other survivor in its window has a
        # lower row-major index (achievers in a shared window always tie
        # in value, so this deduplicates plateaus deterministically)
        keep2 = keep.copy()
        for y in range(h):
            for x in range(w):
                for cc in range(c):
                    if not keep[y, x, cc]:
                        continue
                    for yy in range(max(y - pad, 0), min(y + pad + 1, h)):
                        for xx in range(max(x - pad, 0), min(x + pad + 1, w)):
                            if keep[yy, xx, cc] and yy * w + xx < y * w + x:
                                keep2[y, x, cc] = False
        keep = keep2
    scores_map = np.where(keep, prob, 0.0)

    scores = np.zeros((c, k), np.float32)
    coords = np.zeros((c, k, 2), np.float32)
    indices = np.zeros((c, k), np.int64)
    for cc in range(c):
        flat = scores_map[:, :, cc].reshape(-1)
        # stable: score desc, index asc
        order = np.lexsort((np.arange(flat.size), -flat))[:k]
        scores[cc] = flat[order]
        ys, xs = order // w, order % w
        ox = xs.astype(np.float32)
        oy = ys.astype(np.float32)
        if reg is not None:
            ox = ox + reg[ys, xs, 0]
            oy = oy + reg[ys, xs, 1]
            # the op clamps sub-pixel coords into the map frame
            ox = np.clip(ox, 0.0, w - 1.0)
            oy = np.clip(oy, 0.0, h - 1.0)
        coords[cc, :, 0] = ox
        coords[cc, :, 1] = oy
        indices[cc] = order
    return scores, coords, indices


# --- C11: greedy NMS --------------------------------------------------------

def box_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def greedy_nms(boxes, scores, valid, iou_thresh):
    """Returns kept indices into the input, score-desc (index-asc ties)."""
    order = np.lexsort((np.arange(len(scores)), -np.where(valid, scores, -1)))
    kept = []
    for i in order:
        if not valid[i]:
            continue
        if all(box_iou(boxes[i:i + 1], boxes[j:j + 1])[0, 0] <= iou_thresh
               for j in kept):
            kept.append(i)
    return kept


# --- C12: bilinear crop (half-pixel convention) ----------------------------

def crop_and_resize(img, boxes, out_size):
    """img [H,W,C], boxes [D,4] → [D,R,R,C]; half-pixel centers, edge clamp."""
    h, w, c = img.shape
    d = boxes.shape[0]
    out = np.zeros((d, out_size, out_size, c), np.float32)
    for di in range(d):
        x0, y0, x1, y1 = boxes[di]
        for j in range(out_size):
            for i in range(out_size):
                sx = x0 + (i + 0.5) * (x1 - x0) / out_size - 0.5
                sy = y0 + (j + 0.5) * (y1 - y0) / out_size - 0.5
                xf, yf = np.floor(sx), np.floor(sy)
                fx, fy = sx - xf, sy - yf
                x0i = int(np.clip(xf, 0, w - 1)); x1i = int(np.clip(xf + 1, 0, w - 1))
                y0i = int(np.clip(yf, 0, h - 1)); y1i = int(np.clip(yf + 1, 0, h - 1))
                top = img[y0i, x0i] * (1 - fx) + img[y0i, x1i] * fx
                bot = img[y1i, x0i] * (1 - fx) + img[y1i, x1i] * fx
                out[di, j, i] = top * (1 - fy) + bot * fy
    return out


# --- C17: AP matching (host evaluator) --------------------------------------

def greedy_tp_flags(iou, scores, thresholds):
    """Per-threshold greedy-by-score matching, the slow transparent loop:
    visit predictions by descending score (ties: lowest index), each takes
    the highest-IoU unused GT with IoU >= t (ties: lowest GT index).
    Returns [T, P] bool TP flags."""
    P, G = iou.shape
    flags = np.zeros((len(thresholds), P), bool)
    for ti, t in enumerate(thresholds):
        used = np.zeros(G, bool)
        for i in np.argsort(-scores, kind="stable"):
            best_j, best = -1, -1.0
            for j in range(G):
                if not used[j] and iou[i, j] >= t and iou[i, j] > best:
                    best, best_j = iou[i, j], j
            if best_j >= 0:
                used[best_j] = True
                flags[ti, i] = True
    return flags


def coco_ap(scores, flags, n_gt):
    """101-point-interpolated AP per threshold from dataset-wide TP flags
    ([T, N] aligned with scores [N]) — the textbook loop."""
    order = np.argsort(-scores, kind="stable")
    aps = []
    for t in range(flags.shape[0]):
        tp = np.cumsum(flags[t][order])
        fp = np.cumsum(~flags[t][order])
        recall = tp / max(n_gt, 1)
        precision = tp / np.maximum(tp + fp, 1e-9)
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            sel = recall >= r
            ap += (precision[sel].max() if sel.any() else 0.0) / 101
        aps.append(float(ap))
    return aps
