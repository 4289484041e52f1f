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
