"""Fixed-shape batching + background prefetch.  [SURVEY.md C2, §3.4 rebuild]

The reference renders dense training targets in DataLoader workers; here the
host only assembles images + instance geometry into fixed-shape arrays (see
`data/__init__` for the Batch spec) and target rendering happens on device
inside the jitted train step.  A small thread pool overlaps host decode /
augmentation with device compute — the TPU-idiomatic input pipeline for a
cv2-bound workload.
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Iterator

import numpy as np

from kgtpu.config import DataConfig
from kgtpu.data import transforms

Batch = dict  # {"image", "boxes", "valid", "label_map"} — see data/__init__


def _prepare_sample(sample: dict, cfg: DataConfig, augment: bool,
                    rng: np.random.Generator,
                    image_only: bool = False) -> dict:
    """image_only=True skips GT geometry (inference paths only read the
    image; boxes_from_label_map + renumber are pure waste there).

    Images stay uint8 and color jitter becomes two per-image scalars
    ("img_gain"/"img_bias", applied on device by ops.normalize_images):
    round-2 profiling put host-side normalize + jitter at ~385 ms/sample on
    a 1-core host — the training bottleneck — vs ~nothing as fused XLA.
    """
    if augment:
        m = transforms.random_affine_params(
            rng, cfg.input_size, sample["label_map"].shape,
            scale_range=cfg.scale_range, rotate_deg=cfg.rotate_deg,
            flip_prob=cfg.flip_prob)
        s = transforms.apply_affine(sample, m, cfg.input_size)
        if cfg.elastic_alpha > 0:
            field = transforms.random_elastic_field(
                rng, cfg.input_size, cfg.elastic_alpha, cfg.elastic_sigma)
            s = transforms.apply_elastic(s, field)
    else:
        s = transforms.resize_sample(sample, cfg.input_size)
    img = np.ascontiguousarray(s["image"])               # uint8 [H, W, 3]
    gain = np.ones(3, np.float32)
    bias = np.zeros(3, np.float32)
    if augment and cfg.color_jitter > 0:
        cj = cfg.color_jitter
        gain = rng.uniform(1 - cj, 1 + cj, 3).astype(np.float32)
        bias = (rng.uniform(-cj, cj, 3) * 30).astype(np.float32)
    if image_only:
        return {"image": img, "img_gain": gain, "img_bias": bias,
                "label_map": s["label_map"]}
    boxes, valid, remap = transforms.boxes_from_label_map(
        s["label_map"], cfg.max_instances)
    label = transforms.renumber_label_map(s["label_map"], remap)
    return {"image": img, "img_gain": gain, "img_bias": bias,
            "boxes": boxes, "valid": valid, "label_map": label}


def make_batch(dataset, indices, cfg: DataConfig, augment: bool,
               rng: np.random.Generator | None = None,
               rngs: list[np.random.Generator] | None = None) -> Batch:
    """Either one shared `rng` (sequential per-sample draws) or one
    generator per sample via `rngs` (the iterator's mode — makes each
    sample's augmentation a function of its global position alone, so
    multi-host workers materializing disjoint rows agree with the
    single-host stream)."""
    if rngs is None:
        rngs = [rng] * len(indices)
    samples = [_prepare_sample(dataset[i], cfg, augment, r)
               for i, r in zip(indices, rngs)]
    out = {
        k: np.stack([s[k] for s in samples]) for k in
        ("image", "img_gain", "img_bias", "boxes", "valid", "label_map")
    }
    # label ids fit uint16 (<= max_instances <= 2^16): at 512² the int32 map
    # is the LARGEST leaf in the batch (4 bytes/px vs the image's 3) —
    # halving it matters on high-RTT host→device links; consumers compare /
    # cast, never index-arithmetic on the dtype
    out["label_map"] = out["label_map"].astype(np.uint16)
    return out


def stack_batches(batches: list[Batch]) -> Batch:
    """Stack k batches on a leading steps axis (multi-step dispatch)."""
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def batch_iterator(dataset, cfg: DataConfig, batch_size: int, *,
                   augment: bool = True, shuffle: bool = True, seed: int = 0,
                   steps: int | None = None, prefetch: int = 8,
                   num_workers: int = 4, process_id: int = 0,
                   num_processes: int = 1) -> Iterator[Batch]:
    """Infinite (or `steps`-bounded) iterator of fixed-shape batches.

    cv2/NumPy work runs on a thread pool (cv2 releases the GIL), with
    in-order emission and per-sample RNG derived from (seed, batch index,
    position in the global batch) — results are deterministic regardless of
    worker count or scheduling.

    Multi-host: `batch_size` stays the GLOBAL batch; with
    (process_id, num_processes) set, every host walks the same index
    permutation but materializes only its batch_size/num_processes rows,
    and the per-sample RNG keys on the global position — the concatenation
    of all hosts' batches equals the single-host batch exactly.
    """
    rng = np.random.default_rng(seed)
    n = len(dataset)
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} samples < batch_size {batch_size}; "
            "the iterator would produce no batches")
    if batch_size % num_processes:
        raise ValueError(f"batch_size {batch_size} must divide by "
                         f"num_processes {num_processes}")
    local_bs = batch_size // num_processes
    lo = process_id * local_bs

    def index_stream():
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in range(0, n - batch_size + 1, batch_size):
                yield order[i:i + batch_size]

    stream = index_stream()

    def build(batch_idx: int, indices) -> Batch:
        base = ((seed + 1) * 1_000_003 + batch_idx) * 8191
        rngs = [np.random.default_rng(base + lo + j) for j in range(local_bs)]
        return make_batch(dataset, indices[lo:lo + local_bs], cfg, augment,
                          rngs=rngs)

    ex = concurrent.futures.ThreadPoolExecutor(max_workers=num_workers)
    pending: collections.deque = collections.deque()
    try:
        bi = 0
        while steps is None or bi < steps:
            while len(pending) < prefetch and (steps is None or bi < steps):
                pending.append(ex.submit(build, bi, next(stream)))
                bi += 1
            if not pending:
                return
            yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        for f in pending:
            f.cancel()
        ex.shutdown(wait=False, cancel_futures=True)
