"""Tracing / profiling.  [SURVEY.md §5 "Tracing / profiling"]

The reference's only instrumentation is ad-hoc prints.  Here:
  * `trace(dir)` — context manager around `jax.profiler` (the CLIs expose it
    as --profile_dir); view with TensorBoard or Perfetto.
  * `cost_analysis(fn, *args)` — XLA's per-program FLOP/byte estimates, the
    quick first question ("is this op compute- or bandwidth-bound?") without
    a full trace.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """`with trace("/tmp/prof"): run_steps()` → TensorBoard/Perfetto trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, static_argnums=()) -> dict:
    """Compile fn(*args) and return XLA's cost analysis.

    Returns {"flops": float, "bytes_accessed": float, ...} (keys as reported
    by the backend; empty dict when the backend reports nothing).
    """
    compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
    ca = compiled.cost_analysis()
    if ca is None:
        return {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca)


def summarize_cost(fn, *args, name: str = "fn") -> str:
    ca = cost_analysis(fn, *args)
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", ca.get("bytes_accessed", 0.0))
    ai = flops / byts if byts else float("nan")
    return (f"{name}: {flops/1e9:.2f} GFLOP, {byts/1e6:.1f} MB accessed, "
            f"arithmetic intensity {ai:.1f} FLOP/B")
