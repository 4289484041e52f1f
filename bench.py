#!/usr/bin/env python
"""Headline benchmark: end-to-end two-stage inference images/sec at 512².

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

`vs_baseline` is measured against `benchmarks/self_baseline.json` — the
round-1 number recorded on this repo's own first TPU run.  (No reference
numbers are recoverable: BASELINE.json `published` is {} and the reference
mount is empty — see BASELINE.md.  The ≥5×-A100 north-star is tracked by
improving this self-baseline round over round.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SELF_BASELINE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "self_baseline.json")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import pin_valid_dets
    from kgtpu.config import Config
    from kgtpu.infer import _detect_batch, _mask_batch
    from kgtpu.models import KGNet
    from kgtpu.ops.preprocess import normalize_images
    from kgtpu.train_lib import create_train_state

    batch = int(os.environ.get("KGTPU_BENCH_BATCH", "32"))
    iters = int(os.environ.get("KGTPU_BENCH_ITERS", "10"))
    # Pinned detection load: the bench net is untrained, so on noise it
    # detects ~nothing — but the shipping mask stage now SKIPS detection-
    # slot chunks with no valid detection (infer.mask_chunk), so an empty
    # load would let the bench dodge the roofline's largest stage entirely.
    # Forcing this many valid slots per image (README: a trained flagship
    # sees 6-25 dets/img; the hard benchmark ~24) measures the pipeline
    # under a realistic load.  Mask-stage cost is shape-static, so only the
    # VALID COUNT matters, not the box contents.
    ndets = int(os.environ.get("KGTPU_BENCH_DETS", "24"))

    cfg = Config()
    # measurement hook: compare backbone variants (e.g. hourglass_fast)
    # under the identical harness without touching the shipping default
    bb = os.environ.get("KGTPU_BENCH_BACKBONE")
    if bb:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=bb))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    from kgtpu.infer import _maybe_fused
    # same model-variant swap the shipping build_infer_fn applies — the
    # bench measures the path users get (fused GroupNorm ships OFF: the
    # 2x2 A/B here measured 525 vs 634 img/s, see ops/pallas/groupnorm.py).
    # KGTPU_BENCH_FUSED_NORM=auto re-measures the fused arm.
    import dataclasses as _dc
    cfg = _dc.replace(cfg, infer=_dc.replace(
        cfg.infer,
        fused_norm=os.environ.get("KGTPU_BENCH_FUSED_NORM", "off")))
    model = _maybe_fused(KGNet(cfg=cfg.model), cfg)

    rng = np.random.default_rng(0)
    # raw uint8 pixels — the production input contract (device-side normalize)
    images = jnp.asarray(rng.integers(
        0, 256, size=(batch, cfg.data.input_size, cfg.data.input_size, 3),
        dtype=np.uint8))

    # Execution is forced with an on-device scalar reduction rather than
    # block_until_ready / full fetch: on the tunneled axon platform
    # block_until_ready returns before compute finishes, and fetching the
    # full label map would benchmark the tunnel (1 MB @ ~30 ms RTT), not the
    # chip.  Scalar fetch = compute + one 4-byte round trip.
    @jax.jit
    def reduced(params, imgs):
        x = normalize_images(imgs, cfg.data.mean, cfg.data.std)
        dets, feats = _detect_batch(model, cfg, params, x)
        dets = pin_valid_dets(dets, ndets)
        out = _mask_batch(model, cfg, params, feats, dets,
                          imgs.shape[1], imgs.shape[2])
        return jnp.sum(out["label_map"]) + jnp.sum(out["scores"])

    # XLA cost analysis of the exact program being timed → FLOPs/img and MFU
    # (SURVEY.md §6: throughput is THE metric; MFU says how far from the
    # hardware ceiling it runs).  lower().compile() shares the jit cache with
    # the timed calls below, so this costs one compile total.
    compiled = reduced.lower(state.params, images).compile()
    ca = compiled.cost_analysis() or {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops_img = float(ca.get("flops", 0.0)) / batch

    float(reduced(state.params, images))          # warm (compile done above)
    float(reduced(state.params, images))

    t0 = time.perf_counter()
    vals = [reduced(state.params, images) for _ in range(iters)]
    _ = [float(v) for v in vals]                  # pipelined drain
    dt = time.perf_counter() - t0
    img_s = batch * iters / dt

    vs = 1.0
    if os.path.exists(SELF_BASELINE):
        with open(SELF_BASELINE) as f:
            base = json.load(f).get("e2e_images_per_sec_512")
        if base:
            vs = img_s / base

    # bf16 peak FLOP/s by device generation (MXU compute path is bf16);
    # single source of truth shared with roofline.py / bench_config2
    from benchmarks.common import device_peak
    peak, _ = device_peak()
    mfu = (flops_img * img_s / peak) if (peak and flops_img) else None

    # variant arms get suffixed metric names so collected bench logs can
    # never conflate an A/B arm with the shipping-config number; the fused
    # suffix keys off the model that actually ran (_maybe_fused silently
    # falls back off-TPU / non-group norms), not the requested flag
    suffix = f"_{bb}" if bb else ""
    if model.cfg.norm == "group_fused":
        suffix += "_fusednorm"
    print(json.dumps({
        "metric": "e2e_images_per_sec_512" + suffix,
        "value": round(img_s, 3),
        "unit": "img/s",
        "vs_baseline": round(vs, 3),
        "batch": batch,
        "pinned_dets_per_img": ndets,
        "gflops_per_img": round(flops_img / 1e9, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    try:
        main()
    except RuntimeError as e:
        # Transient tunnel outage ("Unable to initialize backend ...
        # UNAVAILABLE"): retry in a FRESH process — jax caches the failed
        # backend init, so an in-process retry would see the same error.
        tries = int(os.environ.get("KGTPU_BENCH_RETRY", "0"))
        if "nable to initialize backend" not in str(e) or tries >= 5:
            raise
        print(f"TPU backend unavailable (attempt {tries + 1}/5), "
              "retrying in 120s", file=sys.stderr)
        time.sleep(120)
        os.environ["KGTPU_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
