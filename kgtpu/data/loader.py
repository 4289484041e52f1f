"""Fixed-shape batching + background prefetch.  [SURVEY.md C2, §3.4 rebuild]

The reference renders dense training targets in DataLoader workers; here the
host only assembles images + instance geometry into fixed-shape arrays (see
`data/__init__` for the Batch spec) and target rendering happens on device
inside the jitted train step.  A small thread pool overlaps host decode /
augmentation with device compute — the TPU-idiomatic input pipeline for a
cv2-bound workload.
"""

from __future__ import annotations

import queue
import threading
from queue import Empty as _QueueEmpty
from typing import Iterator

import numpy as np

from kgtpu.config import DataConfig
from kgtpu.data import transforms

Batch = dict  # {"image", "boxes", "valid", "label_map"} — see data/__init__


def _prepare_sample(sample: dict, cfg: DataConfig, augment: bool,
                    rng: np.random.Generator) -> dict:
    if augment:
        m = transforms.random_affine_params(
            rng, cfg.input_size, sample["label_map"].shape,
            scale_range=cfg.scale_range, rotate_deg=cfg.rotate_deg,
            flip_prob=cfg.flip_prob)
        s = transforms.apply_affine(sample, m, cfg.input_size,
                                    color_jitter=cfg.color_jitter, rng=rng)
    else:
        s = transforms.resize_sample(sample, cfg.input_size)
    boxes, valid, remap = transforms.boxes_from_label_map(
        s["label_map"], cfg.max_instances)
    label = transforms.renumber_label_map(s["label_map"], remap)
    img = s["image"].astype(np.float32) / 255.0
    img = (img - np.asarray(cfg.mean, np.float32)) / np.asarray(cfg.std, np.float32)
    return {"image": img, "boxes": boxes, "valid": valid, "label_map": label}


def make_batch(dataset, indices, cfg: DataConfig, augment: bool,
               rng: np.random.Generator) -> Batch:
    samples = [_prepare_sample(dataset[i], cfg, augment, rng) for i in indices]
    return {
        k: np.stack([s[k] for s in samples]) for k in
        ("image", "boxes", "valid", "label_map")
    }


def batch_iterator(dataset, cfg: DataConfig, batch_size: int, *,
                   augment: bool = True, shuffle: bool = True, seed: int = 0,
                   steps: int | None = None, prefetch: int = 2,
                   ) -> Iterator[Batch]:
    """Infinite (or `steps`-bounded) iterator of fixed-shape batches, with a
    background thread doing the cv2 work."""
    rng = np.random.default_rng(seed)
    n = len(dataset)

    def index_stream():
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                yield order[i:i + batch_size]

    stream = index_stream()
    total = steps if steps is not None else None
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        produced = 0
        wrng = np.random.default_rng(seed + 1)
        while not stop.is_set() and (total is None or produced < total):
            idx = next(stream)
            q.put(make_batch(dataset, idx, cfg, augment, wrng))
            produced += 1
        q.put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            b = q.get()
            if b is None:
                return
            yield b
    finally:
        stop.set()
        # drain so the worker's blocked put() can exit
        try:
            while True:
                q.get_nowait()
        except _QueueEmpty:
            pass
