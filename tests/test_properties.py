"""Property-based tests over the core ops (hypothesis; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from kgtpu.config import GroupConfig
from kgtpu.ops.decode import decode_peaks
from kgtpu.ops.group import Boxes, group_keypoints
from kgtpu.ops.nms import box_nms
from kgtpu.ops.targets import keypoints_from_boxes, render_heatmaps


def _boxes_strategy(n=12, frame=64.0):
    from tests.test_ops_nms import _random_dets

    return st.integers(0, 10_000).map(
        lambda seed: _random_dets(np.random.default_rng(seed), n,
                                  frame=frame, p_valid=0.8))


@settings(max_examples=20, deadline=None)
@given(_boxes_strategy())
def test_nms_idempotent(data):
    boxes, scores, valid = data
    dets = Boxes(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    once = box_nms(dets, 0.5)
    twice = box_nms(once, 0.5)
    np.testing.assert_array_equal(np.asarray(once.valid),
                                  np.asarray(twice.valid))
    v = np.asarray(once.valid)
    np.testing.assert_allclose(np.asarray(once.boxes)[v],
                               np.asarray(twice.boxes)[v])
    np.testing.assert_allclose(np.asarray(once.scores)[v],
                               np.asarray(twice.scores)[v])


@settings(max_examples=20, deadline=None)
@given(_boxes_strategy())
def test_nms_survivors_mutually_separated(data):
    boxes, scores, valid = data
    out = box_nms(Boxes(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.asarray(valid)), 0.5)
    kept = np.asarray(out.boxes)[np.asarray(out.valid)]
    from tests.golden.oracles import box_iou
    if len(kept) > 1:
        iou = box_iou(kept, kept)
        np.fill_diagonal(iou, 0.0)
        assert iou.max() <= 0.5 + 1e-6


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_decode_scores_sorted_and_coords_in_bounds(seed):
    rng = np.random.default_rng(seed)
    h, w = 24, 32
    hm = rng.normal(size=(h, w, 5)).astype(np.float32)
    reg = rng.uniform(-0.5, 0.5, size=(h, w, 2)).astype(np.float32)
    out = decode_peaks(jnp.asarray(hm), jnp.asarray(reg), 10)
    s = np.asarray(out.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # with reg in [-0.5, 0.5] the exact invariant is [-0.5, dim-1+0.5];
    # tighter bound catches half-pixel convention regressions (OPEN-10)
    xy = np.asarray(out.coords)
    eps = 1e-6
    assert (xy[..., 0] >= -0.5 - eps).all() and (xy[..., 0] <= w - 0.5 + eps).all()
    assert (xy[..., 1] >= -0.5 - eps).all() and (xy[..., 1] <= h - 0.5 + eps).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000))
def test_group_output_boxes_well_formed(seed):
    """Whatever the peaks, grouped boxes are geometrically valid and scores
    are in [0, 1], descending."""
    rng = np.random.default_rng(seed)
    k = 16
    scores = rng.uniform(0, 1, (5, k)).astype(np.float32)
    coords = rng.uniform(0, 64, (5, k, 2)).astype(np.float32)
    from kgtpu.ops.decode import Peaks
    peaks = Peaks(scores=jnp.asarray(scores), coords=jnp.asarray(coords),
                  indices=jnp.zeros((5, k), jnp.int32))
    cfg = GroupConfig(max_peaks_per_class=k, max_detections=16)
    out = group_keypoints(peaks, cfg)
    b = np.asarray(out.boxes)[np.asarray(out.valid)]
    s = np.asarray(out.scores)
    assert (np.diff(s) <= 1e-6).all()
    assert (s >= 0).all() and (s <= 1 + 1e-6).all()
    if len(b):
        assert (b[:, 2] - b[:, 0] >= cfg.min_box_size - 1e-5).all()
        assert (b[:, 3] - b[:, 1] >= cfg.min_box_size - 1e-5).all()


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000))
def test_heatmap_range_and_peak_location(seed):
    rng = np.random.default_rng(seed)
    n, hgt, wid = 6, 32, 32
    x0 = rng.uniform(0, 20, n); y0 = rng.uniform(0, 20, n)
    bw = rng.uniform(3, 12, n); bh = rng.uniform(3, 12, n)
    boxes = np.stack([x0, y0, x0 + bw, y0 + bh], -1).astype(np.float32)
    kpts = keypoints_from_boxes(jnp.asarray(boxes))
    sizes = jnp.stack([boxes[:, 3] - boxes[:, 1], boxes[:, 2] - boxes[:, 0]], -1)
    hm = np.asarray(render_heatmaps(kpts, sizes, jnp.ones(n), hgt, wid))
    assert hm.min() >= 0.0 and hm.max() <= 1.0 + 1e-6
    # every valid keypoint's floored pixel is exactly 1
    k = np.floor(np.asarray(kpts)).astype(int)
    for i in range(n):
        for c in range(5):
            x, y = k[i, c]
            if 0 <= x < wid and 0 <= y < hgt:
                assert hm[y, x, c] >= 1.0 - 1e-5
