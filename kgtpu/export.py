"""Ahead-of-time serving export: the full inference program as one
serialized StableHLO artifact.  [SURVEY.md C15; production serving]

The reference deploys by shipping model code + a torch checkpoint; a
consumer must re-assemble the exact python pipeline to serve.  On TPU the
idiomatic deployment unit is the compiled program itself: `jax.export`
lowers the jitted end-to-end inference fn (device-side normalize → backbone
→ decode → group → NMS → mask head → paste) to versioned, serializable
StableHLO with the trained weights baked in as constants.  The artifact is
a single file that any jax process can deserialize and call — no kgtpu
model code, no checkpoint, no config flags at the serving site:

    # build side (once, after training)
    python -m kgtpu.export --weights weights/ --out model.kgx --batch 8

    # serving side (no kgtpu.models / checkpoints needed)
    from kgtpu.export import load_serving
    fn = load_serving("model.kgx")
    out = fn(images_uint8)      # (B, H, W, 3) raw pixels
    out["label_map"], out["boxes"], out["scores"], ...

Shapes are static (batch and canvas fixed at export time) — that is the
serving contract everywhere in this framework, and exactly what makes the
artifact a single pre-lowerable XLA program.  Cross-platform: pass
``platforms=("tpu", "cpu")`` to emit one artifact serveable on both.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

__all__ = ["export_infer", "load_serving"]


def export_infer(checkpoint_path: str, out_path: str, *, batch: int = 8,
                 input_size: int | None = None, use_ema: bool = False,
                 platforms: tuple[str, ...] | None = None) -> dict:
    """Export the checkpoint's inference program to `out_path`.

    Weights are baked in (the artifact is self-contained); input is raw
    uint8 ``(batch, input_size, input_size, 3)`` — the production input
    contract (device-side normalization, 4x smaller transfers).  Returns a
    small manifest dict (also useful for logging).
    """
    from jax import export as jexport

    from kgtpu import checkpoint as ckpt
    from kgtpu.config import Config
    from kgtpu.infer import build_infer_fn
    from kgtpu.models import KGNet, required_divisor

    params, extra = ckpt.restore_bundle(checkpoint_path, use_ema=use_ema)
    stored = ckpt.decode_config(extra)
    cfg = Config() if stored is None else dataclasses.replace(
        Config(), model=stored.model)
    if input_size is not None:
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, input_size=input_size))
    size = cfg.infer.input_size
    div = required_divisor(cfg.model)
    if size % div:
        raise ValueError(f"input_size {size} must be divisible by {div}")

    model = KGNet(cfg=cfg.model)
    infer = build_infer_fn(model, cfg)
    serve = jax.jit(lambda images: infer(params, images))  # bake the weights

    spec = jax.ShapeDtypeStruct((batch, size, size, 3), np.uint8)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(serve, **kwargs)(spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    return {
        "out": out_path,
        "bytes": len(blob),
        "batch": batch,
        "input_size": size,
        "platforms": list(exported.platforms),
        "outputs": sorted(exported.out_tree.unflatten(
            [None] * exported.out_tree.num_leaves).keys()),
    }


def load_serving(path: str):
    """Deserialize an `export_infer` artifact into a callable.

    The callable takes raw uint8 images of exactly the exported
    ``(batch, size, size, 3)`` shape and returns the inference output dict
    (label_map, boxes, scores, ... — same pytree as build_infer_fn).
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())

    def serve(images):
        return exported.call(images)

    serve.exported = exported  # introspection: .in_avals, .platforms, ...
    return serve


def _main() -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Export a trained checkpoint's full inference pipeline "
                    "to a self-contained StableHLO serving artifact.")
    p.add_argument("--weights", required=True,
                   help="checkpoint dir / model_<epoch> / <dir>/best")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--input_size", type=int, default=0,
                   help="serving canvas (0 = the config default)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. 'tpu,cpu' (default: current "
                        "backend only)")
    a = p.parse_args()
    manifest = export_infer(
        a.weights, a.out, batch=a.batch,
        input_size=a.input_size or None, use_ema=a.use_ema,
        platforms=tuple(s for s in a.platforms.split(",") if s) or None)
    import json

    print(json.dumps(manifest))


if __name__ == "__main__":
    _main()
