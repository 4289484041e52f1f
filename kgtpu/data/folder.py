"""Plain image-directory reader (inference-only).  [SURVEY.md C2/C15]

`--dataset folder --data_dir <dir>`: every image file under the directory
(recursively), no annotations required — the "run the trained model over a
folder of microscope exports" path.  Label maps are empty, so eval.py is
meaningless here; test.py / Predictor only read the pixels.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

EXTS = (".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp")


class ImageFolder:
    def __init__(self, data_dir: str, split: str = "test"):
        if not os.path.isdir(data_dir):
            raise FileNotFoundError(f"image folder not found: {data_dir}")
        paths = []
        for root, _, files in os.walk(data_dir):
            for f in sorted(files):
                if f.lower().endswith(EXTS):
                    paths.append(os.path.join(root, f))
        if not paths:
            raise FileNotFoundError(
                f"no image files ({'/'.join(EXTS)}) under {data_dir}")
        self.data_dir = data_dir
        self.paths = sorted(paths)
        # ids must be unique (they name the output files): flattening the
        # relpath with '__' can collide (scan__1.png vs scan/1.png) — add a
        # deterministic suffix to repeats
        ids, seen = [], {}
        for p in self.paths:
            rel = os.path.relpath(p, data_dir)
            iid = os.path.splitext(rel)[0].replace(os.sep, "__")
            if iid in seen:
                seen[iid] += 1
                iid = f"{iid}~{seen[iid]}"
            seen.setdefault(iid, 0)
            ids.append(iid)
        self._ids = ids

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        path = self.paths[idx]
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return {"image": img,
                "label_map": np.zeros(img.shape[:2], np.int32),
                "id": self._ids[idx]}
