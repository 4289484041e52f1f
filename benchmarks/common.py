"""Shared benchmark harness.

Timing rule for the tunneled axon TPU (see bench.py): execution is forced by
an on-device scalar reduction + 4-byte fetch; `block_until_ready` returns
early on this platform and full-tensor fetches would measure the tunnel.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def force_scalar(tree) -> jnp.ndarray:
    """Reduce an arbitrary output pytree to one f32 scalar (forces compute)."""
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree)
              if hasattr(x, "astype")]
    return sum(leaves)


def bench_fn(fn, *args, iters: int = 10, warmup: int = 2,
             with_cost: bool = False) -> dict:
    """fn(*args) → pytree.  Returns {sec_per_call, calls_per_sec}.

    with_cost=True adds {"flops", "bytes"} from the cost analysis of the
    SAME compiled program being timed (the scalar reduction adds a few
    adds per leaf — noise).  Prefer this over a separate `cost_analysis`
    call: jit(fn) would be a second full XLA compile, which has measured
    in minutes for whole-pipeline programs on the tunneled dev TPU.
    """
    red = jax.jit(lambda *a: force_scalar(fn(*a)))
    compiled = red.lower(*args).compile()   # populates red's jit cache
    out = {}
    if with_cost:
        c = compiled.cost_analysis() or {}
        if isinstance(c, (list, tuple)):
            c = c[0] if c else {}
        out["flops"] = float(c.get("flops", 0.0))
        out["bytes"] = float(c.get("bytes accessed",
                                   c.get("bytes_accessed", 0.0)))
    float(red(*args))                       # warm (compile done above)
    for _ in range(warmup):
        float(red(*args))
    t0 = time.perf_counter()
    vals = [red(*args) for _ in range(iters)]
    _ = [float(v) for v in vals]            # pipelined drain
    dt = time.perf_counter() - t0
    out.update(sec_per_call=dt / iters, calls_per_sec=iters / dt)
    return out


def cost_analysis(fn, *args) -> tuple[float, float]:
    """(flops, bytes_accessed) of jit(fn)(*args)'s compiled program.

    NOTE: this compiles jit(fn) itself — when also TIMING the same fn, use
    `bench_fn(..., with_cost=True)` instead, which reads the analysis off
    the one program it times (a second whole-pipeline compile has measured
    in minutes on the tunneled dev TPU)."""
    c = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    return (float(c.get("flops", 0.0)),
            float(c.get("bytes accessed", c.get("bytes_accessed", 0.0))))


def device_peak() -> tuple[float | None, float | None]:
    """(bf16 peak FLOP/s, HBM bandwidth B/s) for the current device
    generation — the two roofline ceilings.  (v5e: 197 TFLOP/s bf16,
    819 GB/s HBM; public spec sheet numbers.)"""
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    for tag, fl, bw in (("v5 lite", 197e12, 819e9), ("v5e", 197e12, 819e9),
                        ("v5p", 459e12, 2765e9), ("v4", 275e12, 1228e9),
                        ("v6", 918e12, 1640e9)):
        if tag in kind:
            return fl, bw
    return None, None


def emit(payload: dict) -> None:
    payload.setdefault("backend", jax.default_backend())
    payload.setdefault("device", str(jax.devices()[0]))
    print(json.dumps(payload))


def pin_valid_dets(dets, ndets: int):
    """Force the first `ndets` detection slots valid (bench convention).

    The bench/profiler nets are untrained, so on noise they detect ~nothing
    and the chunk-skipping mask/paste stages would skip every slot chunk —
    pinning a realistic load (README: a trained flagship sees 6-25 dets/img)
    keeps those stages measured.  Mask/paste cost is shape-static, so only
    the valid COUNT matters, not the box contents.  All three tools
    (bench.py, profile_flagship.py, roofline.py) share this helper so the
    pinning convention cannot drift between them.
    """
    from kgtpu.ops.nms import Boxes
    forced = jnp.broadcast_to(
        jnp.arange(dets.valid.shape[1])[None, :] < ndets, dets.valid.shape)
    return Boxes(boxes=dets.boxes, scores=dets.scores, valid=forced)
