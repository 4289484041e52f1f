"""Synthetic blob-cell dataset.  [SURVEY.md §4 "fixed-seed end-to-end smoke"]

Deterministic per-index scenes of elliptical "cells" on textured background —
shaped like the bright-field microscopy data the reference targets (touching,
elongated, variable-scale instances) but generated on the fly, so end-to-end
training/eval tests need no downloaded data.
"""

from __future__ import annotations

import cv2
import numpy as np


class SyntheticCells:
    """Map-style dataset: __getitem__ → {"image" uint8 HxWx3, "label_map" int32}."""

    def __init__(self, size: int = 512, num_images: int = 64,
                 min_cells: int = 3, max_cells: int = 12, seed: int = 0,
                 crowded: bool = False):
        self.size = size
        self.num_images = num_images
        # crowded mode: DSB-nuclei-like density (many small touching cells) —
        # the stress case for keypoint grouping and max_instances padding
        self.min_cells = 40 if crowded else min_cells
        self.max_cells = 90 if crowded else max_cells
        self.crowded = crowded
        self.seed = seed
        self._cache: dict[int, dict] = {}

    def __len__(self) -> int:
        return self.num_images

    def __getitem__(self, idx: int) -> dict:
        if idx in self._cache:   # deterministic per index → memoize
            return self._cache[idx]
        rng = np.random.default_rng(self.seed * 100_003 + idx)
        s = self.size
        img = rng.normal(90, 12, (s, s, 3)).clip(0, 255).astype(np.uint8)
        label = np.zeros((s, s), np.int32)

        n = int(rng.integers(self.min_cells, self.max_cells + 1))
        inst = 0
        lo = max(4, s // 64) if self.crowded else max(6, s // 32)
        hi = max(8, s // 20) if self.crowded else max(10, s // 6)
        for _ in range(n):
            ax = int(rng.integers(lo, hi))
            ay = int(rng.integers(lo, hi))
            cx = int(rng.integers(ax, s - ax))
            cy = int(rng.integers(ay, s - ay))
            ang = float(rng.uniform(0, 180))
            # skip if it would fully cover an existing instance
            probe = np.zeros((s, s), np.uint8)
            cv2.ellipse(probe, (cx, cy), (ax, ay), ang, 0, 360, 1, -1)
            covered = probe.astype(bool)
            overlap = label[covered] > 0
            if overlap.mean() > 0.4:     # keep instances mostly distinct
                continue
            inst += 1
            label[covered] = inst
            shade = int(rng.integers(130, 220))
            cell = img[covered].astype(np.int32)
            img[covered] = np.clip(
                0.35 * cell + 0.65 * shade + rng.normal(0, 6, cell.shape),
                0, 255).astype(np.uint8)

        img = cv2.GaussianBlur(img, (3, 3), 0)
        out = {"image": img, "label_map": label, "id": f"synthetic_{idx:05d}"}
        self._cache[idx] = out
        return out
