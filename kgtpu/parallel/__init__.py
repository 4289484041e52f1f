"""Device mesh + sharding rules.  [SURVEY.md §2.10]

The reference has no distributed machinery (single-process PyTorch, at most
intra-process DataParallel); the rebuild's data parallelism is first-class:
a 1-axis `Mesh(("data",))`, batch arrays sharded on axis 0, params/opt-state
replicated.  `pjit`-inserted XLA collectives (gradient all-reduce) ride ICI.
A second optional "space" axis is reserved for spatial tiling of whole-slide
inference (BASELINE config 5).
"""

from kgtpu.parallel import multihost
from kgtpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    stacked_batch_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "stacked_batch_sharding", "multihost"]
