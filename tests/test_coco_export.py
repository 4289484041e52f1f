"""COCO results export tests (C15/C17 surface)."""

import numpy as np

from kgtpu.coco_export import (
    coco_results_for_image,
    mask_to_rle,
    rle_to_mask,
    write_coco_json,
)


def test_rle_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = rng.random((17, 23)) > 0.6
        assert np.array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_rle_conventions():
    # all-zero mask: single zero-run of H*W
    z = np.zeros((3, 4), bool)
    assert mask_to_rle(z) == {"size": [3, 4], "counts": [12]}
    # mask starting with a 1 at (0,0): counts must start with a 0-length
    # zero-run (COCO convention)
    o = np.zeros((3, 4), bool)
    o[0, 0] = True
    rle = mask_to_rle(o)
    assert rle["counts"][0] == 0 and rle["counts"][1] == 1
    # column-major order: a full first COLUMN is one run of H
    col = np.zeros((3, 4), bool)
    col[:, 0] = True
    assert mask_to_rle(col)["counts"] == [0, 3, 9]


def test_coco_records_slot_alignment(tmp_path):
    label = np.zeros((16, 16), np.int32)
    label[2:6, 2:6] = 1      # slot 0
    label[9:14, 8:15] = 3    # slot 2 (slot 1 suppressed by NMS -> absent)
    boxes = np.array([[2, 2, 6, 6], [0, 0, 1, 1], [8, 9, 15, 14]], np.float32)
    scores = np.array([0.9, 0.0, 0.7], np.float32)
    recs = coco_results_for_image("img_a", label, boxes, scores)
    assert len(recs) == 2
    by_score = {r["score"]: r for r in recs}
    assert by_score[0.9]["bbox"] == [2.0, 2.0, 4.0, 4.0]
    assert by_score[0.7]["bbox"] == [8.0, 9.0, 7.0, 5.0]
    got = rle_to_mask(by_score[0.7]["segmentation"])
    assert np.array_equal(got, label == 3)

    path = str(tmp_path / "r.json")
    n = write_coco_json(path, [{"id": "img_a", "label_map": label,
                                "boxes": boxes, "scores": scores}])
    assert n == 2
    import json
    loaded = json.load(open(path))
    assert loaded[0]["image_id"] == "img_a"
