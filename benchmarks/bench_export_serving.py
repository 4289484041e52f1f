#!/usr/bin/env python
"""Serving-artifact overhead: exported StableHLO call vs live jit.

The deployment story (kgtpu/export.py) bakes weights into one StableHLO
program; this bench answers "does serving the artifact cost anything over
calling the jitted python fn?"  Expected: ~0 — both run the same compiled
XLA executable; the artifact only skips tracing and weight transfer.

Prints one JSON line.  Env: KGTPU_BENCH_BATCH (default 8),
KGTPU_BENCH_SIZE (default 512; use e.g. 128 for a CPU smoke).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import numpy as np

    from benchmarks.common import bench_fn
    from kgtpu import checkpoint, train_lib
    from kgtpu.config import Config, tiny_test_config
    from kgtpu.export import export_infer, load_serving
    from kgtpu.infer import build_infer_fn
    from kgtpu.models import KGNet

    batch = int(os.environ.get("KGTPU_BENCH_BATCH", "8"))
    size = int(os.environ.get("KGTPU_BENCH_SIZE", "512"))

    cfg = Config() if size >= 512 else tiny_test_config()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, input_size=size))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))

    d = tempfile.mkdtemp(prefix="kgx_bench_")
    checkpoint.save(d, epoch=0, state=state,
                    extra={"config_json": checkpoint.encode_config(cfg)})
    art = os.path.join(d, "model.kgx")
    manifest = export_infer(d, art, batch=batch, input_size=size)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, size, size, 3), np.uint8)

    # the artifact's program derives from (stored model arch + default
    # inference knobs + overrides) — build the live fn from the SAME
    # effective config so both sides run identical work
    cfg_eff = dataclasses.replace(
        Config(), model=cfg.model,
        infer=dataclasses.replace(Config().infer, input_size=size))
    live = build_infer_fn(KGNet(cfg=cfg_eff.model), cfg_eff)
    r_live = bench_fn(lambda im: live(state.params, im), imgs)
    serve = load_serving(art)
    r_art = bench_fn(serve, imgs)

    print(json.dumps({
        "metric": "serving_artifact_overhead",
        "value": round(r_art["sec_per_call"] / r_live["sec_per_call"], 4),
        "unit": "x live-jit time (1.0 = free)",
        "live_img_per_s": round(batch / r_live["sec_per_call"], 2),
        "artifact_img_per_s": round(batch / r_art["sec_per_call"], 2),
        "artifact_bytes": manifest["bytes"],
        "batch": batch, "input_size": size,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
