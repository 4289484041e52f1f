"""Dataset reader tests against synthetic on-disk layouts (C2)."""

import os

import cv2
import numpy as np
import pytest

from kgtpu.data.dsb2018 import DSB2018
from kgtpu.data.neural_cells import NeuralCells


def _write_dsb(root, n_images=6, size=48):
    rng = np.random.default_rng(0)
    for i in range(n_images):
        iid = f"img{i:03d}"
        os.makedirs(os.path.join(root, iid, "images"), exist_ok=True)
        os.makedirs(os.path.join(root, iid, "masks"), exist_ok=True)
        img = rng.integers(0, 255, size=(size, size, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, iid, "images", iid + ".png"), img)
        for k in range(2):
            m = np.zeros((size, size), np.uint8)
            cv2.circle(m, (10 + 20 * k, 20), 6, 255, -1)
            cv2.imwrite(os.path.join(root, iid, "masks", f"m{k}.png"), m)


def test_dsb2018_layout_and_split(tmp_path):
    root = str(tmp_path)
    _write_dsb(root)
    train = DSB2018(root, split="train")
    val = DSB2018(root, split="val")
    # split="test" on a dir WITH masks is a training dir: falls back to the
    # held-out val partition (with a warning) so eval never sees train images
    with pytest.warns(UserWarning, match="TRAINING directory"):
        test = DSB2018(root, split="test")
    assert test.ids == val.ids
    assert len(train) + len(val) == 6
    # deterministic split
    assert [d for d in DSB2018(root, split="train").ids] == train.ids

    s = train[0]
    assert s["image"].shape == (48, 48, 3)
    ids = set(np.unique(s["label_map"])) - {0}
    assert ids == {1, 2}
    assert s["id"] == train.ids[0]


def test_dsb2018_true_test_layout_returns_all(tmp_path):
    # a stage1_test-style dir (no masks/) yields every id, no warning
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    for i in range(4):
        iid = f"t{i:02d}"
        os.makedirs(os.path.join(root, iid, "images"))
        img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, iid, "images", iid + ".png"), img)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ds = DSB2018(root, split="test")
    assert len(ds) == 4
    assert ds[0]["label_map"].max() == 0


def test_dsb2018_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        DSB2018(str(tmp_path / "nope"))


def test_neural_cells_label_map_layout(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    rng = np.random.default_rng(1)
    for i in range(4):
        img = rng.integers(0, 255, size=(32, 40, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", f"c{i}.png"), img)
        lab = np.zeros((32, 40), np.uint16)
        lab[4:12, 4:12] = 1
        lab[20:28, 20:30] = 2
        cv2.imwrite(os.path.join(root, "labels", f"c{i}.png"), lab)
    ds = NeuralCells(root, split="train", val_fraction=0.0)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (32, 40, 3)
    assert set(np.unique(s["label_map"])) == {0, 1, 2}
    # split="test" on a labeled dir = training dir: warn + val partition
    with pytest.warns(UserWarning, match="TRAINING directory"):
        tst = NeuralCells(root, split="test")
    val = NeuralCells(root, split="val")
    assert tst.paths == val.paths
    # id-stable split: train/val membership survives adding a file
    train_before = NeuralCells(root, split="train").paths
    cv2.imwrite(os.path.join(root, "images", "zz_new.png"),
                np.zeros((8, 8, 3), np.uint8))
    train_after = NeuralCells(root, split="train").paths
    assert set(train_before) <= set(train_after)


def test_neural_cells_dsb_style_masks(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "masks", "x0"))
    img = np.zeros((24, 24, 3), np.uint8)
    cv2.imwrite(os.path.join(root, "images", "x0.png"), img)
    m = np.zeros((24, 24), np.uint8)
    m[2:10, 2:10] = 255
    cv2.imwrite(os.path.join(root, "masks", "x0", "a.png"), m)
    ds = NeuralCells(root, split="train", val_fraction=0.0)
    s = ds[0]
    assert (s["label_map"] > 0).sum() == 64
