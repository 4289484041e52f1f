"""Datasets, host-side augmentation, fixed-shape batching.  [SURVEY.md C2-C3]

Host/device split (SURVEY.md §7.1): cv2/NumPy do image I/O and affine
augmentation on the host (input pipeline, overlapped with device compute);
everything downstream of `Batch` — target rendering, losses, decoding — is
device-side.  A `Batch` is a dict of fixed-shape NumPy arrays:

  image     [B, H, W, 3] uint8, raw pixels (normalization is device-side)
  boxes     [B, N, 4]   float32, input-pixel coords (x0, y0, x1, y1)
  valid     [B, N]      float32, 1 for real instances (packed first)
  label_map [B, H, W]   uint16, 0 = background, i+1 = instance i
                        (ids fit: N <= 2^16; the int32 map was the largest
                        leaf crossing the host→device link)

N = DataConfig.max_instances; extra instances are dropped by area rank.
"""

from kgtpu.data.loader import (Batch, batch_iterator, make_batch,
                               stack_batches)
from kgtpu.data.synthetic import SyntheticCells
from kgtpu.data.dsb2018 import DSB2018
from kgtpu.data.neural_cells import NeuralCells
from kgtpu.data.registry import build_dataset

__all__ = [
    "Batch", "make_batch", "batch_iterator", "stack_batches",
    "SyntheticCells", "DSB2018", "NeuralCells", "build_dataset",
]
