"""Data layer tests (C2-C3): datasets, transforms, fixed-shape batching."""

import jax
import numpy as np

from kgtpu.config import DataConfig
from kgtpu.data import SyntheticCells, batch_iterator, make_batch
from kgtpu.data import transforms
from kgtpu.ops.preprocess import normalize_images


def test_synthetic_deterministic():
    ds = SyntheticCells(size=96, num_images=4, seed=3)
    a, b = ds[2], ds[2]
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label_map"], b["label_map"])
    assert a["label_map"].max() >= 1


def test_synthetic_hard_phenotype():
    """The hard benchmark variant must actually exhibit the SURVEY.md §0.5
    phenotype it exists to test (VERDICT r2 item 1): wide per-image size
    spread, heavy instance-boundary contact, and deterministic generation."""
    import cv2

    ds = SyntheticCells(size=256, num_images=3, seed=5, hard=True)
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    spreads, touch_fracs = [], []
    for i in range(3):
        lab = ds[i]["label_map"]
        ids = np.unique(lab[lab > 0])
        assert len(ids) >= 10
        sides, touching = [], 0
        for oid in ids:
            m = lab == oid
            ys, xs = np.where(m)
            sides.append(max(ys.max() - ys.min(), xs.max() - xs.min()) + 1)
            dil = cv2.dilate(m.astype(np.uint8),
                             np.ones((3, 3), np.uint8)).astype(bool)
            touching += bool(((lab > 0) & ~m & dil).any())
        spreads.append(max(sides) / max(min(sides), 1))
        touch_fracs.append(touching / len(ids))
    assert max(spreads) > 5.0, spreads          # ~10x size spread target
    assert max(touch_fracs) > 0.5, touch_fracs  # heavy contact


def test_boxes_from_label_map():
    label = np.zeros((20, 20), np.int32)
    label[2:8, 3:10] = 5          # instance id 5
    label[12:18, 12:19] = 2       # instance id 2 (bigger? 6x7=42 = same, 6*7)
    boxes, valid, remap = transforms.boxes_from_label_map(label, 4)
    assert valid.tolist() == [1, 1, 0, 0]
    got = {tuple(b) for b in boxes[:2].tolist()}
    assert (3.0, 2.0, 10.0, 8.0) in got
    assert (12.0, 12.0, 19.0, 18.0) in got
    relabeled = transforms.renumber_label_map(label, remap)
    assert set(np.unique(relabeled)) == {0, 1, 2}
    # slot order must match the box rows
    for slot in range(2):
        ys, xs = np.nonzero(relabeled == slot + 1)
        assert xs.min() == boxes[slot][0] and ys.min() == boxes[slot][1]


def test_truncation_keeps_largest():
    label = np.zeros((30, 30), np.int32)
    label[0:20, 0:20] = 1          # big
    label[25:27, 25:27] = 2        # small
    boxes, valid, _ = transforms.boxes_from_label_map(label, 1)
    assert valid.tolist() == [1]
    assert tuple(boxes[0]) == (0.0, 0.0, 20.0, 20.0)


def test_batch_shapes_and_normalization():
    cfg = DataConfig(input_size=64, max_instances=8)
    ds = SyntheticCells(size=64, num_images=4, seed=0)
    b = make_batch(ds, [0, 1], cfg, augment=False,
                   rng=np.random.default_rng(0))
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["boxes"].shape == (2, 8, 4)
    assert b["valid"].shape == (2, 8)
    assert b["label_map"].shape == (2, 64, 64)
    # raw uint8 pixels out; normalization happens on device
    # (ops.normalize_images) — host float math was the input bottleneck
    assert b["image"].dtype == np.uint8
    assert b["img_gain"].shape == (2, 3) and b["img_bias"].shape == (2, 3)
    # no-jitter eval batch: identity gain/bias
    np.testing.assert_array_equal(b["img_gain"], np.ones((2, 3), np.float32))
    ni = np.asarray(jax.jit(
        lambda x: normalize_images(x, cfg.mean, cfg.std))(b["image"]))
    assert ni.dtype == np.float32 and abs(ni.mean()) < 3.0
    # boxes must be consistent with the (renumbered) label map
    for bi in range(2):
        for slot in range(8):
            if b["valid"][bi, slot]:
                ys, xs = np.nonzero(b["label_map"][bi] == slot + 1)
                x0, y0, x1, y1 = b["boxes"][bi, slot]
                assert xs.min() == x0 and xs.max() + 1 == x1
                assert ys.min() == y0 and ys.max() + 1 == y1


def test_augment_consistency():
    """Augmented boxes must still tightly bound the warped label map."""
    cfg = DataConfig(input_size=64, max_instances=8, flip_prob=1.0,
                     scale_range=(0.9, 1.1), rotate_deg=15.0)
    ds = SyntheticCells(size=96, num_images=2, seed=1)
    b = make_batch(ds, [0], cfg, augment=True, rng=np.random.default_rng(7))
    assert b["valid"][0].sum() >= 1
    for slot in range(8):
        if b["valid"][0, slot]:
            ys, xs = np.nonzero(b["label_map"][0] == slot + 1)
            x0, y0, x1, y1 = b["boxes"][0, slot]
            assert xs.min() == x0 and ys.min() == y0


def test_batch_iterator_bounded_and_prefetching():
    cfg = DataConfig(input_size=48, max_instances=4)
    ds = SyntheticCells(size=48, num_images=8, seed=0)
    batches = list(batch_iterator(ds, cfg, 2, steps=3, seed=0))
    assert len(batches) == 3
    assert all(b["image"].shape == (2, 48, 48, 3) for b in batches)


def test_elastic_warp_consistency():
    """Elastic deformation keeps image/label consistency: instance ids
    survive, the warped mask moves WITH the image, and zero alpha is the
    identity."""
    from kgtpu.data import transforms
    rng = np.random.default_rng(0)
    size = 96
    img = np.zeros((size, size, 3), np.uint8)
    lab = np.zeros((size, size), np.int32)
    lab[20:50, 30:60] = 1
    lab[60:80, 10:30] = 2
    img[lab == 1] = (255, 0, 0)
    img[lab == 2] = (0, 255, 0)
    sample = {"image": img, "label_map": lab}

    # alpha=0 -> identity
    f0 = transforms.random_elastic_field(rng, size, 0.0, 32.0)
    s0 = transforms.apply_elastic(sample, f0)
    np.testing.assert_array_equal(s0["label_map"], lab)
    np.testing.assert_array_equal(s0["image"], img)

    # a real warp: ids survive, and the red channel still coincides with
    # instance 1's warped mask (image and label moved together)
    f = transforms.random_elastic_field(rng, size, 8.0, 24.0)
    assert np.abs(f).max() <= 8.0 * 1.2   # bicubic overshoots ±1 slightly
    s = transforms.apply_elastic(sample, f)
    assert set(np.unique(s["label_map"])) == {0, 1, 2}
    m1 = s["label_map"] == 1
    red = s["image"][..., 0] > 128
    inter = (m1 & red).sum()
    assert inter / m1.sum() > 0.95, "label did not move with the image"
    # area approximately preserved (smooth field, modest alpha)
    assert 0.7 < m1.sum() / (lab == 1).sum() < 1.3


def test_elastic_flag_reaches_config():
    from kgtpu.config import build_train_parser, config_from_train_args
    a = build_train_parser().parse_args(
        ["--dataset", "synthetic", "--aug_elastic", "12,16"])
    cfg = config_from_train_args(a)
    assert cfg.data.elastic_alpha == 12.0
    assert cfg.data.elastic_sigma == 16.0
    import pytest
    with pytest.raises(SystemExit):
        config_from_train_args(build_train_parser().parse_args(
            ["--dataset", "synthetic", "--aug_elastic", "nope"]))
