"""Tests for the demo-output renderer (kgtpu/visualize.py)."""

import numpy as np

from kgtpu.visualize import denormalize, draw_instances


def test_denormalize_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    norm = (img.astype(np.float32) / 255.0 - mean) / std
    back = denormalize(norm, mean, std)
    assert back.dtype == np.uint8
    np.testing.assert_allclose(back, img, atol=1)


def test_draw_instances_overlays_and_boxes():
    img = np.full((32, 32, 3), 100, np.uint8)
    label = np.zeros((32, 32), np.int32)
    label[4:12, 4:12] = 1
    boxes = np.asarray([[4.0, 4.0, 12.0, 12.0], [0, 0, 0, 0]], np.float32)
    scores = np.asarray([0.9, 0.0], np.float32)
    valid = np.asarray([True, False])
    vis = draw_instances(img, label, boxes, scores, valid)
    assert vis.shape == img.shape and vis.dtype == np.uint8
    # masked region tinted, background untouched away from the box/text
    assert not np.array_equal(vis[6, 6], img[6, 6])
    np.testing.assert_array_equal(vis[30, 30], img[30, 30])


def test_draw_instances_empty_scene():
    img = np.zeros((8, 8, 3), np.uint8)
    vis = draw_instances(img, np.zeros((8, 8), np.int32),
                         np.zeros((0, 4)), np.zeros(0), np.zeros(0, bool))
    np.testing.assert_array_equal(vis, img)
