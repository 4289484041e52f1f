"""Kaggle DSB2018 nuclei dataset reader.  [SURVEY.md C2]

Expects the stage1 layout used by the reference family:

  data_dir/
    <image_id>/
      images/<image_id>.png
      masks/<mask_uuid>.png        # one binary PNG per instance (train only)

`split` chooses a deterministic train/val partition by id hash (the reference
uses a fixed file-list split; with no list recoverable — mount empty — an
id-stable hash split is the reproducible equivalent).
"""

from __future__ import annotations

import hashlib
import os

import cv2
import numpy as np


class DSB2018:
    def __init__(self, data_dir: str, split: str = "train",
                 val_fraction: float = 0.1):
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(f"DSB2018 data_dir not found: {data_dir}")
        ids = sorted(
            d for d in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, d, "images"))
        )
        def bucket(s):
            h = int(hashlib.md5(s.encode()).hexdigest(), 16) % 1000
            return "val" if h < val_fraction * 1000 else "train"
        if split in ("train", "val"):
            ids = [i for i in ids if bucket(i) == split]
        elif split == "test":
            # A true stage1_test dir has no masks/.  If masks ARE present the
            # user pointed test.py/eval.py at a TRAINING directory; returning
            # all ids would silently evaluate the model on its own training
            # images (inflated AP).  Use the held-out val partition instead.
            has_masks = any(
                os.path.isdir(os.path.join(data_dir, i, "masks")) for i in ids)
            if has_masks:
                import warnings
                warnings.warn(
                    f"DSB2018 split='test' on {data_dir}: masks/ present, so "
                    "this looks like a TRAINING directory — evaluating on the "
                    "held-out val partition instead of all ids to avoid "
                    "train-set leakage. Point --data_dir at stage1_test for "
                    "a full test run.", stacklevel=2)
                ids = [i for i in ids if bucket(i) == "val"]
        self.data_dir = data_dir
        self.ids = ids

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, idx: int) -> dict:
        iid = self.ids[idx]
        img_path = os.path.join(self.data_dir, iid, "images", iid + ".png")
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(img_path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        label = np.zeros(img.shape[:2], np.int32)
        mask_dir = os.path.join(self.data_dir, iid, "masks")
        if os.path.isdir(mask_dir):
            for k, f in enumerate(sorted(os.listdir(mask_dir))):
                m = cv2.imread(os.path.join(mask_dir, f), cv2.IMREAD_GRAYSCALE)
                if m is not None:
                    label[m > 127] = k + 1
        return {"image": img, "label_map": label, "id": iid}
