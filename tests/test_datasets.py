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


# ---------------------------------------------------------------------------
# COCO-format reader
# ---------------------------------------------------------------------------

def _rle_string_from_counts(counts):
    """Test-side encoder replica of the pycocotools counts codec — the
    reader's decoder is validated by round-trip against this."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                   not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def _counts_from_mask(mask):
    """Column-major alternating runs, background first."""
    flat = mask.reshape(-1, order="F").astype(np.int32)
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    return runs


def _write_coco(root, *, per_split=False):
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(3)
    h, w = 40, 32
    images, annotations = [], []
    masks_by_image = {}
    for i in range(6):
        fname = f"cell_{i:03d}.png"
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", fname), img)
        images.append({"id": 100 + i, "file_name": fname,
                       "height": h, "width": w})
        # instance 1: polygon rectangle; instance 2: RLE blob
        poly_box = [4.0, 4.0, 14.0, 4.0, 14.0, 12.0, 4.0, 12.0]
        m2 = np.zeros((h, w), bool)
        m2[20 + i % 3: 30 + i % 3, 8:20] = True
        counts = _counts_from_mask(m2)
        rle = ({"size": [h, w], "counts": _rle_string_from_counts(counts)}
               if i % 2 == 0 else {"size": [h, w], "counts": counts})
        annotations += [
            {"id": 2 * i, "image_id": 100 + i, "iscrowd": 0,
             "segmentation": [poly_box], "category_id": 1},
            {"id": 2 * i + 1, "image_id": 100 + i, "iscrowd": 0,
             "segmentation": rle, "category_id": 1},
            # crowd region must be ignored
            {"id": 1000 + i, "image_id": 100 + i, "iscrowd": 1,
             "segmentation": {"size": [h, w],
                              "counts": [0, h * w]}, "category_id": 1},
        ]
        masks_by_image[os.path.splitext(fname)[0]] = m2
    doc = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "cell"}]}
    import json
    if per_split:
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        for split in ("train", "val"):
            with open(os.path.join(root, "annotations",
                                   f"instances_{split}.json"), "w") as f:
                json.dump(doc, f)
    else:
        with open(os.path.join(root, "annotations.json"), "w") as f:
            json.dump(doc, f)
    return masks_by_image


def test_coco_reader_polygon_and_rle(tmp_path):
    from kgtpu.data.coco import CocoDataset
    root = str(tmp_path)
    rle_masks = _write_coco(root)
    ds = CocoDataset(root, split="train")
    assert len(ds) > 0
    seen_rle = 0
    for i in range(len(ds)):
        s = ds[i]
        assert s["image"].shape == (40, 32, 3)
        lab = s["label_map"]
        ids = sorted(np.unique(lab))
        assert ids[0] == 0 and len(ids) == 3     # bg + 2 instances, no crowd
        # the RLE instance must reproduce its mask exactly (codec round-trip)
        m2 = rle_masks[s["id"]]
        match = [np.array_equal(lab == k, m2) for k in ids[1:]]
        assert any(match), f"RLE mask not recovered for {s['id']}"
        seen_rle += 1
        # the polygon instance covers the rectangle interior
        poly_lab = lab[6:11, 6:13]
        assert (poly_lab > 0).all() and len(np.unique(poly_lab)) == 1
    assert seen_rle == len(ds)


def test_coco_rle_string_codec_roundtrip():
    from kgtpu.data.coco import mask_from_rle, rle_counts_from_string
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = rng.random((13, 17)) > 0.6
        counts = _counts_from_mask(m)
        s = _rle_string_from_counts(counts)
        dec = rle_counts_from_string(s)
        assert dec == counts, (dec, counts)
        np.testing.assert_array_equal(mask_from_rle(dec, 13, 17), m)


def test_coco_split_disjoint_and_test_guard(tmp_path):
    from kgtpu.data.coco import CocoDataset
    root = str(tmp_path)
    _write_coco(root)
    tr = CocoDataset(root, split="train", val_fraction=0.4)
    va = CocoDataset(root, split="val", val_fraction=0.4)
    assert set(tr.ids).isdisjoint(va.ids)
    assert len(tr) + len(va) == 6
    with pytest.warns(UserWarning, match="leakage"):
        te = CocoDataset(root, split="test", val_fraction=0.4)
    assert te.ids == va.ids


def test_coco_per_split_annotation_files(tmp_path):
    from kgtpu.data.coco import CocoDataset
    root = str(tmp_path)
    _write_coco(root, per_split=True)
    tr = CocoDataset(root, split="train")
    assert len(tr) == 6                 # explicit file: no hash split
    te = CocoDataset(root, split="test")   # falls back to instances_val
    assert len(te) == 6


def test_coco_registry_and_batching(tmp_path):
    """The reader must flow through build_dataset + the fixed-shape batcher."""
    import dataclasses

    from kgtpu.config import Config
    from kgtpu.data import build_dataset, make_batch
    root = str(tmp_path)
    _write_coco(root)
    dcfg = dataclasses.replace(Config().data, dataset="coco", data_dir=root,
                               input_size=64, max_instances=8)
    ds = build_dataset(dcfg, split="train")
    b = make_batch(ds, [0], dcfg, augment=False,
                   rng=np.random.default_rng(0))
    assert b["image"].shape == (1, 64, 64, 3)
    assert b["valid"].sum() == 2


def test_coco_train_only_export_stays_disjoint(tmp_path):
    """A lone instances_train.json must be hash-split consistently for all
    splits — otherwise split='val' would return a subset of the images
    split='train' already served (eval-on-train leak)."""
    import json
    import shutil

    from kgtpu.data.coco import CocoDataset
    root = str(tmp_path)
    _write_coco(root)
    os.makedirs(os.path.join(root, "annotations"))
    shutil.move(os.path.join(root, "annotations.json"),
                os.path.join(root, "annotations", "instances_train.json"))
    tr = CocoDataset(root, split="train", val_fraction=0.4)
    va = CocoDataset(root, split="val", val_fraction=0.4)
    assert set(tr.ids).isdisjoint(va.ids)
    assert len(tr) + len(va) == 6
    # two per-split files but none for the requested split -> explicit error
    with open(os.path.join(root, "annotations", "instances_val.json"),
              "w") as f:
        json.dump({"images": [], "annotations": []}, f)
    with pytest.raises(FileNotFoundError, match="per-split"):
        CocoDataset(root, split="test2020")


def test_coco_canonical_year_layout(tmp_path):
    """annotations/instances_val2017.json + val2017/<images> (the canonical
    COCO release layout) must resolve image paths via the file's suffix."""
    import shutil

    from kgtpu.data.coco import CocoDataset
    root = str(tmp_path)
    _write_coco(root)
    os.makedirs(os.path.join(root, "annotations"))
    shutil.move(os.path.join(root, "annotations.json"),
                os.path.join(root, "annotations", "instances_val2017.json"))
    shutil.move(os.path.join(root, "images"), os.path.join(root, "val2017"))
    # a published val file is genuinely held out: split='test' gets it whole
    ds = CocoDataset(root, split="test")
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (40, 32, 3)
    assert s["label_map"].max() == 2
    # but train/val requests on the same lone file stay disjoint
    tr = CocoDataset(root, split="train", val_fraction=0.4)
    va = CocoDataset(root, split="val", val_fraction=0.4)
    assert set(tr.ids).isdisjoint(va.ids) and len(tr) + len(va) == 6


def test_image_folder_reader(tmp_path):
    from kgtpu.data.folder import ImageFolder
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "plate1"))
    rng = np.random.default_rng(5)
    for name in ("a.png", os.path.join("plate1", "b.tif")):
        img = rng.integers(0, 255, size=(24, 32, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, name), img)
    ds = ImageFolder(root)
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (24, 32, 3)
    assert s["label_map"].shape == (24, 32) and s["label_map"].max() == 0
    ids = {ds[i]["id"] for i in range(2)}
    assert ids == {"a", "plate1__b"}
    with pytest.raises(FileNotFoundError):
        ImageFolder(str(tmp_path / "empty_nope"))


def test_image_folder_train_rejected(tmp_path):
    """train.py must refuse the annotation-less folder dataset."""
    import subprocess
    import sys
    root = str(tmp_path)
    cv2.imwrite(os.path.join(root, "x.png"), np.zeros((8, 8, 3), np.uint8))
    top = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(top, "train.py"), "--dataset",
         "folder", "--data_dir", root],
        env={**os.environ, "KGTPU_PLATFORM": "cpu"},
        capture_output=True, text=True, timeout=300)
    assert r.returncode != 0
    assert "inference-only" in r.stderr


def test_image_folder_id_collisions_resolved(tmp_path):
    """scan__1.png and scan/1.png must not share an output id."""
    from kgtpu.data.folder import ImageFolder
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "scan"))
    for name in ("scan__1.png", os.path.join("scan", "1.png")):
        cv2.imwrite(os.path.join(root, name), np.zeros((8, 8, 3), np.uint8))
    ds = ImageFolder(root)
    ids = [ds[i]["id"] for i in range(len(ds))]
    assert len(set(ids)) == 2, ids
