"""Multi-host (multi-controller) data parallelism.  [extends SURVEY.md §2.10]

The reference has no distributed machinery at all; the rebuild's single-host
design is jit-with-shardings over a device mesh (mesh.py).  This module
extends the SAME design across hosts: every host runs the same SPMD program
over the global mesh, each host feeds only its local shard of the batch, and
XLA emits the cross-host collectives (gradient all-reduce over ICI/DCN on
TPU pods; Gloo on the CPU backend, which is how tests exercise two real
processes on one machine).

Usage contract (train.py wires this):
  * call `initialize(coordinator, num_hosts, host_id)` before any other JAX
    use on every host;
  * every host iterates the SAME global index stream and materializes only
    its rows (`batch_iterator(..., process_id, num_processes)`), then wraps
    them into one global array per leaf (`global_batch`);
  * checkpoint saves are called on ALL hosts (orbax coordinates and writes
    once — requires a shared filesystem); log/metric files are written by
    the main host only (`is_main()`).
"""

from __future__ import annotations

import jax
import numpy as np

from kgtpu.parallel.mesh import batch_sharding, stacked_batch_sharding


def initialize(coordinator: str, num_hosts: int, host_id: int,
               timeout_s: int = 600) -> None:
    """`jax.distributed.initialize` with explicit topology.

    On TPU pod slices the arguments can be omitted entirely (the runtime
    auto-detects); explicit values are what CPU/Gloo and manual clusters
    need.  Must run before any device query on every host.

    After init this runs one throwaway barrier collective.  The CPU/Gloo
    backend builds its communicator clique lazily at the FIRST collective,
    with a hard-coded ~30 s key-value rendezvous window
    (``make_gloo_tcp_collectives`` exposes no timeout knob) — if that first
    collective is the training step's gradient all-reduce, the window has
    to absorb the full inter-host skew of dataset build + model init +
    compilation, which on a loaded host routinely exceeds 30 s and kills
    the run with ``GetKeyValue() timed out``.  Doing the rendezvous here,
    when the hosts are skewed only by import time (they entered
    ``jax.distributed.initialize`` together — it has its own barrier with
    a proper `timeout_s`), makes every later collective reuse the
    established clique."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_hosts, process_id=host_id,
                               initialization_timeout=timeout_s)
    if num_hosts > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("kgtpu:gloo_warmup")


def is_main() -> bool:
    return jax.process_index() == 0


def broadcast_scalar(x: float) -> float:
    """Main host's value on every host.  Host-control decisions (e.g. 'is
    this epoch a new validation best?') must be identical everywhere —
    independently computed floats can straddle a comparison and desync the
    hosts' collective calls (checkpoint saves)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    return float(multihost_utils.broadcast_one_to_all(
        np.asarray(x, np.float32)))


def all_hosts_max(x: float) -> float:
    """Max of a per-host scalar across hosts (e.g. host RSS, so every host
    reaches the same watchdog decision in lockstep)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    return float(multihost_utils.process_allgather(
        np.asarray(x, np.float32)).max())


def global_batch(batch: dict, mesh, *, stacked: bool = False) -> dict:
    """Per-host local batch shards → one global jax.Array per leaf.

    With `stacked` the leaves carry a leading steps axis ([k, local_B, ...],
    multi-step dispatch) and the batch axis is axis 1; otherwise axis 0.
    Every host must pass shards of identical shape (the fixed-shape batch
    discipline guarantees it)."""
    nproc = jax.process_count()
    axis = 1 if stacked else 0
    sh = stacked_batch_sharding(mesh) if stacked else batch_sharding(mesh)

    def to_global(x):
        x = np.asarray(x)
        gshape = list(x.shape)
        gshape[axis] *= nproc
        return jax.make_array_from_process_local_data(sh, x, tuple(gshape))

    return {k: to_global(v) for k, v in batch.items()}
