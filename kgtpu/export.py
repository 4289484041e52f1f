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
                 platforms: tuple[str, ...] | None = None,
                 mode: str = "single",
                 test_scales: tuple[float, ...] | None = None,
                 test_flip: bool | None = None,
                 slide_hw: tuple[int, int] | None = None,
                 tile_size: int | None = None) -> dict:
    """Export the checkpoint's inference program to `out_path`.

    Weights are baked in (the artifact is self-contained); inputs are raw
    uint8 pixels — the production input contract (device-side
    normalization, 4x smaller transfers).  Returns a manifest dict whose
    ``inputs`` entry records the exact serving-call shapes.

    mode="single": images (batch, size, size, 3).
    mode="tta":    dict {"<scale>": (batch, side_s, side_s, 3)} with
                   side_s = round-to-divisor(scale * size) — the same
                   per-scale sides test.py feeds build_multiscale_fn.
    mode="tiled":  one whole slide (H, W, 3) of static `slide_hw`
                   (BASELINE config 5's one-call whole-slide program).
    """
    from jax import export as jexport

    from kgtpu import checkpoint as ckpt
    from kgtpu.config import Config
    from kgtpu.infer import (build_infer_fn, build_multiscale_fn,
                             build_tiled_infer_fn)
    from kgtpu.models import KGNet, required_divisor

    params, extra = ckpt.restore_bundle(checkpoint_path, use_ema=use_ema)
    stored = ckpt.decode_config(extra)
    cfg = Config() if stored is None else dataclasses.replace(
        Config(), model=stored.model)
    infer_overrides = {}
    if input_size is not None:
        infer_overrides["input_size"] = input_size
    if test_scales is not None:
        infer_overrides["test_scales"] = tuple(test_scales)
    if test_flip is not None:
        infer_overrides["test_flip"] = test_flip
    if tile_size is not None:
        infer_overrides["tile_size"] = tile_size
    if infer_overrides:
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, **infer_overrides))
    # same serving semantics as Predictor/test.py: checkpoints trained
    # without a wh head fall back to the stored-stats size cap, so the
    # artifact prunes the same ghosts the live paths do
    from kgtpu.predictor import size_prior_fallback
    cfg = size_prior_fallback(cfg, extra)
    if mode == "tta" and 1.0 not in cfg.infer.test_scales:
        # the mask stage runs on base-scale features; the variant merge maps
        # everything to scale 1.0 (same rule config.py enforces for test.py)
        raise ValueError(
            f"test_scales {cfg.infer.test_scales} must include 1.0")
    size = cfg.infer.input_size
    div = required_divisor(cfg.model)
    checked = cfg.infer.tile_size if mode == "tiled" else size
    if checked % div:
        raise ValueError(f"input side {checked} must be divisible by {div}")

    model = KGNet(cfg=cfg.model)
    if mode == "single":
        fn = build_infer_fn(model, cfg)
        spec = jax.ShapeDtypeStruct((batch, size, size, 3), np.uint8)
    elif mode == "tta":
        fn = build_multiscale_fn(model, cfg)
        # per-scale sides: test.py's round-to-divisor rule
        spec = {
            f"{sc:g}": jax.ShapeDtypeStruct(
                (batch, max(round(size * sc / div), 1) * div,
                 max(round(size * sc / div), 1) * div, 3), np.uint8)
            for sc in cfg.infer.test_scales}
    elif mode == "tiled":
        if slide_hw is None:
            raise ValueError('mode="tiled" needs slide_hw=(H, W)')
        fn = build_tiled_infer_fn(model, cfg, slide_hw)
        spec = jax.ShapeDtypeStruct((*slide_hw, 3), np.uint8)
    else:
        raise ValueError(f"unknown export mode {mode!r}")
    serve = jax.jit(lambda images: fn(params, images))  # bake the weights

    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    exported = jexport.export(serve, **kwargs)(spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    out_leaves = exported.out_tree.unflatten(
        [None] * exported.out_tree.num_leaves)
    return {
        "out": out_path,
        "bytes": len(blob),
        "mode": mode,
        "batch": batch,
        "input_size": size,
        "inputs": jax.tree.map(lambda s: list(s.shape), spec),
        "platforms": list(exported.platforms),
        "outputs": (sorted(out_leaves.keys())
                    if isinstance(out_leaves, dict) else None),
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
    p.add_argument("--tta", action="store_true",
                   help="export the multi-scale TTA program "
                        "(inputs: dict of per-scale image batches)")
    p.add_argument("--test_scales", default="",
                   help="TTA scales, e.g. '0.75,1.0,1.25'")
    p.add_argument("--test_flip", action="store_true")
    p.add_argument("--slide", default="",
                   help="'H,W' — export the one-call whole-slide tiled "
                        "program for this static slide size")
    p.add_argument("--tile_size", type=int, default=0,
                   help="tile side for --slide mode (0 = config default)")
    a = p.parse_args()
    if a.tta and a.slide:
        raise SystemExit("--tta and --slide are exclusive")
    mode = "tta" if a.tta else ("tiled" if a.slide else "single")
    manifest = export_infer(
        a.weights, a.out, batch=a.batch, mode=mode,
        input_size=a.input_size or None, use_ema=a.use_ema,
        test_scales=(tuple(float(s) for s in a.test_scales.split(","))
                     if a.test_scales else None),
        test_flip=a.test_flip or None,
        slide_hw=(tuple(int(s) for s in a.slide.split(","))
                  if a.slide else None),
        tile_size=a.tile_size or None,
        platforms=tuple(s for s in a.platforms.split(",") if s) or None)
    import json

    print(json.dumps(manifest))


if __name__ == "__main__":
    _main()
