"""Evaluator unit tests (C17): AJI and PQ against hand-computed values,
plus invariants shared with the AP protocols.

All cases are tiny label maps whose pairwise pixel counts are small enough
to verify by hand in the comments.
"""

import numpy as np
import pytest

from kgtpu import evaluate


def _maps(pred_rows, gt_rows):
    return np.asarray(pred_rows, np.int32), np.asarray(gt_rows, np.int32)


def test_aji_perfect_prediction_is_one():
    gt = np.zeros((8, 8), np.int32)
    gt[1:4, 1:4] = 1
    gt[5:8, 5:8] = 2
    assert evaluate.aji_image(gt.copy(), gt) == pytest.approx(1.0)


def test_aji_empty_cases():
    empty = np.zeros((4, 4), np.int32)
    one = empty.copy()
    one[1:3, 1:3] = 1
    assert evaluate.aji_image(empty, empty) == 1.0   # nothing to find, found nothing
    assert evaluate.aji_image(one, empty) == 0.0     # pure false positive
    assert evaluate.aji_image(empty, one) == 0.0     # pure miss


def test_aji_hand_computed():
    # GT: one 2x4=8px instance.  Pred: one 2x2=4px instance fully inside it
    # (inter 4, union 8) plus one 2x2=4px instance fully outside (unmatched).
    # AJI = 4 / (8 + 4) = 1/3.
    pred = np.zeros((4, 8), np.int32)
    gt = np.zeros((4, 8), np.int32)
    gt[0:2, 0:4] = 1
    pred[0:2, 0:2] = 1
    pred[2:4, 6:8] = 2
    assert evaluate.aji_image(pred, gt) == pytest.approx(1 / 3)


def test_aji_unmatched_gt_counts_in_union():
    # Pred covers GT 1 exactly (4px); GT 2 (4px) has no prediction.
    # AJI = 4 / (4 + 4) = 0.5.
    pred = np.zeros((4, 8), np.int32)
    gt = np.zeros((4, 8), np.int32)
    gt[0:2, 0:2] = 1
    gt[0:2, 4:6] = 2
    pred[0:2, 0:2] = 7        # ids need not be contiguous
    assert evaluate.aji_image(pred, gt) == pytest.approx(0.5)


def test_aji_shared_best_pred_over_penalizes():
    # The canonical AJI quirk: one prediction can be the best match of two
    # GTs; its pair union is then counted twice.  Pred spans both 2px GTs
    # plus the 2px gap (6px total).  Per GT: inter 2, union 6.
    # AJI = (2+2) / (6+6) = 1/3 — NOT (2+2)/6.
    pred = np.zeros((1, 6), np.int32)
    gt = np.zeros((1, 6), np.int32)
    pred[0, :] = 1
    gt[0, 0:2] = 1
    gt[0, 4:6] = 2
    assert evaluate.aji_image(pred, gt) == pytest.approx(1 / 3)


def test_pq_perfect():
    gt = np.zeros((8, 8), np.int32)
    gt[1:4, 1:4] = 1
    gt[5:8, 5:8] = 2
    recs = [{"pred_label": gt.copy(), "gt_label": gt}]
    r = evaluate.evaluate_pq(recs)
    assert r["PQ"] == pytest.approx(1.0)
    assert r["SQ"] == pytest.approx(1.0)
    assert r["RQ"] == pytest.approx(1.0)
    assert (r["TP"], r["FP"], r["FN"]) == (2, 0, 0)


def test_pq_hand_computed():
    # GT: 4px instance.  Pred A: 3 of those 4 px (inter 3, union 4, IoU .75
    # -> TP).  Pred B: 4px elsewhere (FP).  A second GT (4px) unmatched (FN).
    # SQ = 0.75, RQ = 1/(1+.5+.5) = 0.5, PQ = 0.375.
    pred = np.zeros((4, 8), np.int32)
    gt = np.zeros((4, 8), np.int32)
    gt[0:2, 0:2] = 1
    gt[2:4, 0:2] = 2
    pred[0, 0:2] = 1
    pred[1, 0] = 1
    pred[0:2, 4:6] = 2
    r = evaluate.evaluate_pq([{"pred_label": pred, "gt_label": gt}])
    assert (r["TP"], r["FP"], r["FN"]) == (1, 1, 1)
    assert r["SQ"] == pytest.approx(0.75)
    assert r["RQ"] == pytest.approx(0.5)
    assert r["PQ"] == pytest.approx(0.375)


def test_pq_iou_exactly_half_is_not_a_match():
    # Kirillov et al. require IoU STRICTLY > 0.5.  Pred = left half of a
    # 2x4 GT extended one px outside: inter 2... construct IoU == 0.5:
    # pred 2px, gt 4px, inter 2 -> IoU 2/4 = 0.5 -> no match.
    pred = np.zeros((1, 8), np.int32)
    gt = np.zeros((1, 8), np.int32)
    gt[0, 0:4] = 1
    pred[0, 0:2] = 1
    r = evaluate.evaluate_pq([{"pred_label": pred, "gt_label": gt}])
    assert (r["TP"], r["FP"], r["FN"]) == (0, 1, 1)
    assert r["PQ"] == 0.0


def test_pq_rejects_low_threshold():
    with pytest.raises(ValueError):
        evaluate.evaluate_pq([], iou_thresh=0.3)


def test_pq_empty_dataset_edge():
    r = evaluate.evaluate_pq(
        [{"pred_label": np.zeros((4, 4), np.int32),
          "gt_label": np.zeros((4, 4), np.int32)}])
    assert r["RQ"] == 1.0 and r["PQ"] == 0.0   # SQ undefined -> 0


def test_evaluate_aji_multi_image_mean():
    gt = np.zeros((4, 4), np.int32)
    gt[0:2, 0:2] = 1
    recs = [{"pred_label": gt.copy(), "gt_label": gt},          # AJI 1
            {"pred_label": np.zeros_like(gt), "gt_label": gt}]  # AJI 0
    r = evaluate.evaluate_aji(recs)
    assert r["AJI"] == pytest.approx(0.5)
    assert r["per_image"] == [1.0, 0.0]


def test_pair_stats_matches_mask_expansion():
    """_pair_stats (one bincount pass) must equal the O(P*G) mask-expansion
    IoU used by the AP protocols, on random label maps."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        pred = rng.integers(0, 5, (16, 16)).astype(np.int32)
        gt = rng.integers(0, 4, (16, 16)).astype(np.int32)
        inter, p_area, g_area = evaluate._pair_stats(pred, gt)
        union = p_area[:, None] + g_area[None, :] - inter
        iou = inter / np.maximum(union, 1e-9)
        ref, _, _ = evaluate.iou_from_label_maps(pred, gt)
        np.testing.assert_allclose(iou, ref, atol=1e-6)


def test_greedy_tp_flags_matches_loop_oracle():
    """The all-thresholds-at-once vectorized matcher equals the per-threshold
    greedy loop (incl. exact-tie IoUs and tied scores)."""
    from tests.golden import oracles
    rng = np.random.default_rng(7)
    for _ in range(20):
        P, G = rng.integers(0, 12, 2)
        iou = rng.uniform(0, 1, (P, G))
        iou[rng.uniform(size=iou.shape) < 0.3] = 0.55      # exact-tie cells
        scores = np.round(rng.uniform(0, 1, P), 1)          # tied scores
        got = evaluate.greedy_tp_flags(iou, scores, evaluate.IOU_THRESHOLDS)
        want = oracles.greedy_tp_flags(iou, scores, evaluate.IOU_THRESHOLDS)
        np.testing.assert_array_equal(got, want)


def test_evaluate_coco_matches_textbook_ap():
    """Dataset-level vectorized AP equals the textbook cumsum/101-pt loop on
    random label maps (multi-image, varying instance counts)."""
    from tests.golden import oracles
    rng = np.random.default_rng(3)
    recs, all_s, all_f, n_gt = [], [], [], 0
    for _ in range(6):
        pred = rng.integers(0, 6, (24, 24)).astype(np.int32)
        gt = rng.integers(0, 5, (24, 24)).astype(np.int32)
        n_pred_ids = len([i for i in np.unique(pred) if i > 0])
        scores = rng.uniform(0.1, 1, int(pred.max()))
        recs.append({"pred_label": pred, "gt_label": gt, "scores": scores})
        iou, s, ng = evaluate._rec_iou(recs[-1])
        n_gt += ng
        all_s.append(s)
        all_f.append(oracles.greedy_tp_flags(iou, s, evaluate.IOU_THRESHOLDS)
                     if ng else np.zeros((10, len(s)), bool))
    got = evaluate.evaluate_coco(recs)
    want = oracles.coco_ap(np.concatenate(all_s),
                           np.concatenate(all_f, axis=1), n_gt)
    assert got["AP_coco"] == pytest.approx(float(np.mean(want)), abs=1e-9)
    assert got["AP50"] == pytest.approx(want[0], abs=1e-9)
    assert got["AP75"] == pytest.approx(want[5], abs=1e-9)
