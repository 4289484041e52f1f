"""Host-side mask AP evaluation.  [SURVEY.md C17; OPEN-5 resolution]

Two protocols:
  * "dsb2018" — the Kaggle Data Science Bowl 2018 metric: per image and IoU
    threshold t ∈ {0.50, 0.55, …, 0.95}, precision = TP/(TP+FP+FN) with
    greedy IoU matching; mean over thresholds, then over images.
  * "coco"    — dataset-level AP: score-ranked PR curve per threshold with
    101-point interpolation, averaged over the same thresholds.

Pure NumPy, not in the hot path (SURVEY.md §3.5 stays host-side).
"""

from __future__ import annotations

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def instance_masks_from_label_map(label: np.ndarray) -> list[np.ndarray]:
    """Label map → list of boolean masks, ordered by instance id."""
    ids = np.unique(label)
    return [label == i for i in ids if i > 0]


def mask_iou_matrix(preds: list[np.ndarray], gts: list[np.ndarray]) -> np.ndarray:
    """[P, G] IoU between boolean masks."""
    if not preds or not gts:
        return np.zeros((len(preds), len(gts)))
    p = np.stack([m.reshape(-1) for m in preds]).astype(np.float32)
    g = np.stack([m.reshape(-1) for m in gts]).astype(np.float32)
    inter = p @ g.T
    union = p.sum(1)[:, None] + g.sum(1)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def iou_from_label_maps(pred: np.ndarray, gt: np.ndarray
                        ) -> tuple[np.ndarray, list[int], list[int]]:
    """IoU between the *present* instances of two label maps.

    Returns (iou [P, G], pred_ids, gt_ids) where rows/cols follow the
    ascending present-id order.  Uses the native single-pass op when
    available (kgtpu/native), NumPy mask expansion otherwise.
    """
    pred_ids = [int(i) for i in np.unique(pred) if i > 0]
    gt_ids = [int(i) for i in np.unique(gt) if i > 0]
    from kgtpu import native
    dense = native.label_map_iou(pred, gt)
    if dense is not None:
        rows = [i - 1 for i in pred_ids]
        cols = [i - 1 for i in gt_ids]
        return dense[np.ix_(rows, cols)] if rows and cols else np.zeros(
            (len(rows), len(cols))), pred_ids, gt_ids
    iou = mask_iou_matrix([pred == i for i in pred_ids],
                          [gt == i for i in gt_ids])
    return iou, pred_ids, gt_ids


def _greedy_match(iou: np.ndarray, scores: np.ndarray, t: float) -> int:
    """Greedy by score: #TP at IoU threshold t."""
    used = np.zeros(iou.shape[1], bool)
    tp = 0
    for i in np.argsort(-scores):
        j = -1
        best = t
        for jj in range(iou.shape[1]):
            if not used[jj] and iou[i, jj] >= best:
                best = iou[i, jj]
                j = jj
        if j >= 0:
            used[j] = True
            tp += 1
    return tp


def dsb2018_image_score(iou: np.ndarray, pred_scores: np.ndarray,
                        n_gt: int) -> float:
    """Mean over thresholds of TP/(TP+FP+FN) for one image."""
    n_pred = iou.shape[0]
    if n_gt == 0:
        return 1.0 if n_pred == 0 else 0.0
    vals = []
    for t in IOU_THRESHOLDS:
        tp = _greedy_match(iou, pred_scores, t) if n_pred else 0
        fp = n_pred - tp
        fn = n_gt - tp
        vals.append(tp / max(tp + fp + fn, 1))
    return float(np.mean(vals))


def _rec_iou(rec: dict) -> tuple[np.ndarray, np.ndarray, int]:
    """(iou [P,G], pred scores [P], n_gt) for one per-image record."""
    iou, pred_ids, gt_ids = iou_from_label_maps(rec["pred_label"],
                                                rec["gt_label"])
    s = (np.asarray([rec["scores"][i - 1] for i in pred_ids], np.float32)
         if pred_ids else np.zeros(0, np.float32))
    return iou, s, len(gt_ids)


def evaluate_dsb2018(per_image: list[dict]) -> dict:
    """per_image: [{"pred_label": HxW int, "scores": [D], "gt_label": HxW int}]."""
    scores = []
    for rec in per_image:
        iou, s, n_gt = _rec_iou(rec)
        scores.append(dsb2018_image_score(iou, s, n_gt))
    return {"mAP_dsb2018": float(np.mean(scores)) if scores else 0.0,
            "per_image": scores}


def evaluate_coco(per_image: list[dict]) -> dict:
    """Dataset-level mask AP@[.5:.95] with 101-point interpolation."""
    all_matches = {t: [] for t in IOU_THRESHOLDS}   # (score, is_tp)
    n_gt = 0
    for rec in per_image:
        iou, s, ng = _rec_iou(rec)
        n_gt += ng
        for t in IOU_THRESHOLDS:
            used = np.zeros(ng, bool)
            for i in np.argsort(-s):
                j, best = -1, t
                for jj in range(ng):
                    if not used[jj] and iou[i, jj] >= best:
                        best, j = iou[i, jj], jj
                if j >= 0:
                    used[j] = True
                    all_matches[t].append((s[i], 1))
                else:
                    all_matches[t].append((s[i], 0))

    aps = []
    for t in IOU_THRESHOLDS:
        m = sorted(all_matches[t], key=lambda x: -x[0])
        if not m or n_gt == 0:
            aps.append(0.0)
            continue
        tps = np.cumsum([x[1] for x in m])
        fps = np.cumsum([1 - x[1] for x in m])
        recall = tps / n_gt
        precision = tps / np.maximum(tps + fps, 1e-9)
        # 101-point interpolation
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            p = precision[recall >= r].max() if (recall >= r).any() else 0.0
            ap += p / 101
        aps.append(float(ap))
    return {"AP_coco": float(np.mean(aps)),
            "AP50": aps[0], "AP75": aps[5]}
