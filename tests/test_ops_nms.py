"""Golden-parity tests for on-device NMS (C11) + cross-scale merge (C16)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.ops.group import Boxes
from kgtpu.ops.nms import batched_box_iou, box_nms, merge_scales
from tests.golden import oracles


def _random_dets(rng, n, frame=100.0, p_valid=0.9):
    x0 = rng.uniform(0, frame - 10, n)
    y0 = rng.uniform(0, frame - 10, n)
    w = rng.uniform(2, 30, n)
    h = rng.uniform(2, 30, n)
    boxes = np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    valid = rng.uniform(size=n) < p_valid
    return boxes, scores, valid


def test_iou_matches_oracle():
    rng = np.random.default_rng(0)
    a, _, _ = _random_dets(rng, 13)
    b, _, _ = _random_dets(rng, 7)
    got = np.asarray(batched_box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, oracles.box_iou(a, b), rtol=1e-5, atol=1e-6)


def test_nms_matches_greedy_oracle():
    rng = np.random.default_rng(1)
    for trial in range(5):
        boxes, scores, valid = _random_dets(rng, 40)
        dets = Boxes(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        out = jax.jit(lambda d: box_nms(d, 0.5))(dets)
        kept_idx = oracles.greedy_nms(boxes, scores, valid, 0.5)
        want_boxes = boxes[kept_idx]
        got_boxes = np.asarray(out.boxes)[np.asarray(out.valid)]
        assert got_boxes.shape == want_boxes.shape
        np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-6)
        got_scores = np.asarray(out.scores)[np.asarray(out.valid)]
        np.testing.assert_allclose(got_scores, scores[kept_idx], rtol=1e-6)


def test_nms_keeps_order_and_pads_tail():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.5, 0.9, 0.7], np.float32)
    dets = Boxes(jnp.asarray(boxes), jnp.asarray(scores),
                 jnp.ones(3, dtype=bool))
    out = box_nms(dets, 0.5)
    v = np.asarray(out.valid)
    assert v.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(out.boxes)[0], boxes[1])
    np.testing.assert_allclose(np.asarray(out.boxes)[1], boxes[2])
    assert np.asarray(out.scores)[2] == 0.0


def _box_nms_sequential(dets, iou_thresh, max_out=None):
    """The round-2 fori_loop implementation, kept as an exact-equality
    reference for the parallel-rounds rewrite (VERDICT r2 item 4)."""
    from jax import lax

    n = dets.boxes.shape[0]
    max_out = max_out or n
    sort_key = jnp.where(dets.valid, dets.scores, -1.0)
    order = jnp.argsort(-sort_key, stable=True)
    boxes = dets.boxes[order]
    scores = dets.scores[order]
    valid = dets.valid[order]
    iou = batched_box_iou(boxes, boxes)
    idx = jnp.arange(n)

    def body(i, keep):
        suppressed = jnp.any(keep & (idx < i) & (iou[:, i] > iou_thresh))
        return keep.at[i].set(valid[i] & jnp.logical_not(suppressed))

    keep = lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    out_order = jnp.argsort(jnp.logical_not(keep), stable=True)[:max_out]
    return Boxes(boxes=boxes[out_order],
                 scores=jnp.where(keep[out_order], scores[out_order], 0.0),
                 valid=keep[out_order])


def test_parallel_nms_equals_sequential_exactly():
    rng = np.random.default_rng(7)
    for trial in range(8):
        # dense overlap regime to force multi-round resolution
        boxes, scores, valid = _random_dets(rng, 64, frame=60.0)
        dets = Boxes(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(valid))
        for thr in (0.3, 0.5, 0.7):
            got = box_nms(dets, thr)
            want = _box_nms_sequential(dets, thr)
            np.testing.assert_array_equal(np.asarray(got.valid),
                                          np.asarray(want.valid))
            np.testing.assert_array_equal(np.asarray(got.boxes),
                                          np.asarray(want.boxes))
            np.testing.assert_array_equal(np.asarray(got.scores),
                                          np.asarray(want.scores))


def test_nms_suppression_chain_revives_third_box():
    # A (0.9) kills B (0.8); B would have killed C (0.7), but B is dead, so
    # greedy keeps C.  Distinguishes greedy from "suppressed by any
    # higher-scored overlap" and forces >1 parallel round.
    boxes = np.array([[0, 0, 10, 10], [6, 0, 16, 10], [12, 0, 22, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = box_nms(Boxes(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(3, bool)), 0.2)
    v = np.asarray(out.valid)
    assert v.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(out.scores)[:2], [0.9, 0.7])


def test_merge_scales_mean_vote_rescoring():
    """vote="mean": a box both variants agree on outranks a higher-scored box
    only one variant saw; vote_thresh drops the lone ghost entirely."""
    a = Boxes(jnp.asarray(np.array([[0, 0, 10, 10], [30, 30, 40, 40]],
                                   np.float32)),
              jnp.asarray(np.array([0.8, 0.9], np.float32)),
              jnp.ones(2, bool))
    b = Boxes(jnp.asarray(np.array([[0.5, 0, 10.5, 10], [0, 0, 0, 0]],
                                   np.float32)),
              jnp.asarray(np.array([0.6, 0.0], np.float32)),
              jnp.asarray([True, False]))
    out = merge_scales([a, b], iou_thresh=0.5, max_out=4, vote="mean")
    v = np.asarray(out.valid)
    assert v.sum() == 2
    # agreed box: mean(0.8, 0.6) = 0.7 ranks above lone 0.9 -> 0.45
    np.testing.assert_allclose(np.asarray(out.scores)[:2], [0.7, 0.45],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.boxes)[0], [0, 0, 10, 10])
    # thresholded: the single-variant box disappears
    out2 = merge_scales([a, b], iou_thresh=0.5, max_out=4, vote="mean",
                        vote_thresh=0.5)
    assert np.asarray(out2.valid).sum() == 1
    np.testing.assert_allclose(np.asarray(out2.scores)[0], 0.7, rtol=1e-6)


def test_merge_scales_unions_and_dedups():
    a = Boxes(jnp.asarray(np.array([[0, 0, 10, 10]], np.float32)),
              jnp.asarray(np.array([0.8], np.float32)), jnp.ones(1, dtype=bool))
    b = Boxes(jnp.asarray(np.array([[0.2, 0.1, 10.1, 10.2], [30, 30, 40, 40]],
                                   np.float32)),
              jnp.asarray(np.array([0.9, 0.6], np.float32)),
              jnp.ones(2, dtype=bool))
    out = merge_scales([a, b], iou_thresh=0.5, max_out=4)
    v = np.asarray(out.valid)
    assert v.sum() == 2
    np.testing.assert_allclose(np.asarray(out.scores)[:2], [0.9, 0.6])
