"""Tests for the keypoint-graph grouper (C10) — the hardest op (§7.3 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.config import GroupConfig
from kgtpu.ops.decode import Peaks
from kgtpu.ops.group import group_keypoints
from kgtpu.ops.targets import keypoints_from_boxes


def _peaks_from_boxes(boxes, scores, k=16, noise=0.0, rng=None):
    """Build ideal per-class peaks from GT boxes (all 5 classes present)."""
    n = boxes.shape[0]
    kpts = np.asarray(keypoints_from_boxes(jnp.asarray(boxes)))  # [N,5,2]
    if noise and rng is not None:
        kpts = kpts + rng.normal(0, noise, kpts.shape)
    ps = np.zeros((5, k), np.float32)
    pc = np.zeros((5, k, 2), np.float32)
    for c in range(5):
        order = np.argsort(-scores)
        for slot, i in enumerate(order[:k]):
            ps[c, slot] = scores[i]
            pc[c, slot] = kpts[i, c]
    return Peaks(scores=jnp.asarray(ps), coords=jnp.asarray(pc),
                 indices=jnp.zeros((5, k), jnp.int32))


def test_group_recovers_clean_boxes():
    boxes = np.array(
        [[4.0, 6.0, 20.0, 18.0],
         [30.0, 5.0, 44.0, 27.0],
         [10.0, 30.0, 26.0, 42.0]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    cfg = GroupConfig(max_peaks_per_class=16, max_detections=16)
    out = jax.jit(lambda p: group_keypoints(p, cfg))(_peaks_from_boxes(boxes, scores))
    got_boxes = np.asarray(out.boxes)[np.asarray(out.valid)]
    # every GT box must appear among the valid candidates (pre-NMS)
    for b in boxes:
        d = np.abs(got_boxes - b).max(axis=-1)
        assert d.min() < 1e-4, f"box {b} not recovered"
    # and the three top-scored detections are the three GT boxes
    top3 = np.asarray(out.boxes)[:3]
    for b in boxes:
        assert np.abs(top3 - b).max(axis=-1).min() < 1e-4


def test_group_rejects_cross_pairs_without_center():
    # two diagonal boxes whose TL/BR cross-pairing has no center support
    boxes = np.array([[2.0, 2.0, 10.0, 10.0], [30.0, 30.0, 40.0, 40.0]], np.float32)
    scores = np.array([0.9, 0.9], np.float32)
    cfg = GroupConfig(max_peaks_per_class=8, max_detections=16)
    out = group_keypoints(_peaks_from_boxes(boxes, scores), cfg)
    got = np.asarray(out.boxes)[np.asarray(out.valid)]
    # the cross box (2,2,40,40) must be rejected (its midpoint (21,21) is far
    # from both centers relative to tolerance)
    for b in got:
        assert not (abs(b[0] - 2) < 1 and abs(b[2] - 40) < 1), f"ghost box {b}"


def test_group_scores_monotonic_and_padding_invalid():
    boxes = np.array([[4.0, 6.0, 20.0, 18.0]], np.float32)
    out = group_keypoints(
        _peaks_from_boxes(boxes, np.array([0.9], np.float32)),
        GroupConfig(max_peaks_per_class=8, max_detections=8),
    )
    s = np.asarray(out.scores)
    v = np.asarray(out.valid)
    assert (np.diff(s) <= 1e-6).all()
    assert s[~v].max(initial=0.0) == 0.0
    assert v[0]


def test_group_robust_to_keypoint_noise():
    rng = np.random.default_rng(0)
    boxes = np.array([[8.0, 8.0, 40.0, 30.0], [50.0, 20.0, 90.0, 60.0]], np.float32)
    scores = np.array([0.85, 0.8], np.float32)
    peaks = _peaks_from_boxes(boxes, scores, noise=1.0, rng=rng)
    out = group_keypoints(peaks, GroupConfig(max_peaks_per_class=8, max_detections=8))
    got = np.asarray(out.boxes)[np.asarray(out.valid)]
    for b in boxes:
        assert np.abs(got - b).max(axis=-1).min() < 3.0


def test_group_max_box_size_kills_cross_ghosts():
    """Crowded-scene regression: when a cell's partner corner is MISSED
    (common in dense scenes), its leftover corner can cross-pair with a
    distant cell's leftover corner into a huge ghost whose midpoint lands
    near some third cell's center.  The size prior must reject it."""
    boxes = np.array(
        [[2.0, 2.0, 10.0, 10.0],      # cell A (its BR will be missed)
         [60.0, 60.0, 68.0, 68.0],    # cell B (its TL will be missed)
         [31.0, 31.0, 39.0, 39.0]],   # cell C centered at the ghost midpoint
        np.float32)
    scores = np.array([0.9, 0.9, 0.9], np.float32)
    peaks = _peaks_from_boxes(boxes, scores)
    # equal scores → slot i == instance i; knock out A.BR and B.TL
    from kgtpu.config import KP_BR, KP_TL
    ps = np.asarray(peaks.scores).copy()
    ps[KP_BR, 0] = 0.0
    ps[KP_TL, 1] = 0.0
    peaks = peaks._replace(scores=jnp.asarray(ps))

    # without the cap: A.TL x B.BR ghost (2,2,68,68) forms, supported by C
    out2 = group_keypoints(peaks, GroupConfig(max_peaks_per_class=16,
                                              max_detections=16))
    got2 = np.asarray(out2.boxes)[np.asarray(out2.valid)]
    assert any((b[2] - b[0]) > 20 for b in got2), "expected ghost w/o cap"

    # with the cap: only well-sized boxes survive
    out = group_keypoints(peaks, GroupConfig(max_peaks_per_class=16,
                                             max_detections=16,
                                             max_box_size=20.0))
    got = np.asarray(out.boxes)[np.asarray(out.valid)]
    assert len(got) >= 1
    for b in got:
        assert (b[2] - b[0]) <= 20.0 and (b[3] - b[1]) <= 20.0


def test_group_min_box_size_filters_degenerate():
    boxes = np.array([[10.0, 10.0, 10.5, 10.5]], np.float32)  # sub-min box
    out = group_keypoints(
        _peaks_from_boxes(boxes, np.array([0.99], np.float32)),
        GroupConfig(max_peaks_per_class=8, max_detections=8, min_box_size=2.0),
    )
    assert not bool(np.asarray(out.valid).any())


def test_group_size_prune_kills_cross_ghosts_without_prior():
    """Same crowded-scene ghost as test_group_max_box_size_kills_cross_ghosts,
    but pruned by the wh head's per-corner size prediction (size_prune) with
    NO dataset max_box_size prior — VERDICT.md round-1 item 5."""
    boxes = np.array(
        [[2.0, 2.0, 10.0, 10.0],      # cell A (its BR will be missed)
         [60.0, 60.0, 68.0, 68.0],    # cell B (its TL will be missed)
         [31.0, 31.0, 39.0, 39.0]],   # cell C centered at the ghost midpoint
        np.float32)
    scores = np.array([0.9, 0.9, 0.9], np.float32)
    peaks = _peaks_from_boxes(boxes, scores)
    from kgtpu.config import KP_BR, KP_TL
    ps = np.asarray(peaks.scores).copy()
    ps[KP_BR, 0] = 0.0
    ps[KP_TL, 1] = 0.0
    peaks = peaks._replace(scores=jnp.asarray(ps))

    # a well-trained wh head predicts ~the instance's own size at every peak
    wh = np.zeros((5, 16, 2), np.float32)
    wh[:, :3] = 8.0                    # all three cells are 8x8 stride px
    cfg = GroupConfig(max_peaks_per_class=16, max_detections=16,
                      size_prune=3.0)
    assert cfg.max_box_size >= 1e9     # explicitly NO dataset prior

    out = jax.jit(lambda p, w: group_keypoints(p, cfg, kp_wh=w))(
        peaks, jnp.asarray(wh))
    got = np.asarray(out.boxes)[np.asarray(out.valid)]
    assert len(got) >= 1
    for b in got:                      # ghost (span 66) > 3 x 8 is gone
        assert (b[2] - b[0]) <= 24.0 and (b[3] - b[1]) <= 24.0

    # same peaks with size_prune disabled: the ghost IS there (guards that
    # this test actually exercises the gate)
    out2 = group_keypoints(peaks, GroupConfig(max_peaks_per_class=16,
                                              max_detections=16,
                                              size_prune=0.0))
    got2 = np.asarray(out2.boxes)[np.asarray(out2.valid)]
    assert any((b[2] - b[0]) > 24 for b in got2)


def test_group_size_prune_keeps_small_boxes_with_noisy_wh():
    """Near-zero (noisy) wh predictions must not veto legitimately small
    boxes: the gate has a 1-stride-px floor."""
    boxes = np.array([[4.0, 4.0, 7.0, 7.0]], np.float32)   # 3x3 box
    scores = np.array([0.9], np.float32)
    peaks = _peaks_from_boxes(boxes, scores)
    wh = np.full((5, 16, 2), 0.01, np.float32)             # head says ~0
    cfg = GroupConfig(max_peaks_per_class=16, max_detections=16,
                      size_prune=3.0)
    out = group_keypoints(peaks, cfg, kp_wh=jnp.asarray(wh))
    got = np.asarray(out.boxes)[np.asarray(out.valid)]
    assert len(got) == 1 and np.abs(got[0] - boxes[0]).max() < 1e-4
