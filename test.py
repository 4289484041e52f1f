#!/usr/bin/env python
"""Inference CLI — mirrors the reference's test.py entry point.  [SURVEY.md C15-C16]

Writes, per image:
  <save_dir>/<id>_label.png     uint16 instance label map (0 = background)
  <save_dir>/<id>.json          {"boxes": [[x0,y0,x1,y1],...], "scores": [...]}
and a summary <save_dir>/detections.json.

Example:
  python test.py --dataset synthetic --weights /tmp/weights --input_size 128 \
      --save_dir /tmp/results --test_scales 0.75,1.0,1.25
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from kgtpu.config import build_test_parser, config_from_test_args

    args = build_test_parser().parse_args()
    cfg = config_from_test_args(args)

    import cv2
    import jax
    import numpy as np

    # the axon sitecustomize pins jax_platforms programmatically, so the
    # plain JAX_PLATFORMS env var is ignored (CLAUDE.md trap); this explicit
    # override makes CPU-backend CLI runs (tests, debugging) possible
    if os.environ.get("KGTPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KGTPU_PLATFORM"])

    from kgtpu.utils import enable_compilation_cache
    enable_compilation_cache()

    if getattr(args, "debug_nans", False):
        from kgtpu.utils import enable_nan_debugging
        enable_nan_debugging()

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("kgtpu.test")

    import dataclasses

    from kgtpu import checkpoint, train_lib
    from kgtpu.data import build_dataset
    from kgtpu.data.loader import _prepare_sample
    from kgtpu.infer import build_infer_fn, build_multiscale_fn
    from kgtpu.models import KGNet, required_divisor

    tiled = getattr(args, "tiled", False)

    if cfg.infer.weights:
        params, ck_extra = checkpoint.restore_bundle(
            cfg.infer.weights, use_ema=getattr(args, "use_ema", False))
        # self-describing checkpoints (VERDICT r2 item 5): the architecture
        # the weights were trained with is stored in the checkpoint; rebuild
        # the model from it and treat explicitly-passed flags as overrides,
        # so `python test.py --weights <dir>` needs zero architecture flags
        stored = checkpoint.decode_config(ck_extra)
        if stored is not None:
            from kgtpu.config import (apply_model_overrides,
                                      build_test_parser, explicit_cli_dests)
            explicit = explicit_cli_dests(build_test_parser())
            cfg = dataclasses.replace(
                cfg, model=apply_model_overrides(stored.model, args, explicit))
            log.info("model architecture from checkpoint config: backbone=%s "
                     "num_stacks=%d norm=%s roi_size=%d (explicit CLI flags "
                     "override)", cfg.model.backbone, cfg.model.num_stacks,
                     cfg.model.norm, cfg.model.roi_size)
    else:
        params = None

    # --ensemble: extra members merged with the primary via the TTA
    # agreement vote (build_ensemble_fn).  Each member rebuilds from its
    # own stored Config — no CLI overrides apply to members, only to the
    # primary (which also runs the mask stage).
    members = []
    for w in [x for x in getattr(args, "ensemble", "").split(",") if x]:
        if not cfg.infer.weights:
            raise SystemExit("--ensemble needs --weights (the mask member)")
        if tiled:
            raise SystemExit("--ensemble and --tiled are exclusive")
        eparams, eextra = checkpoint.restore_bundle(
            w, use_ema=getattr(args, "use_ema", False))
        estored = checkpoint.decode_config(eextra)
        if estored is None:
            raise SystemExit(f"--ensemble member {w} has no self-describing "
                             "config; re-save it with this repo's train.py")
        members.append((KGNet(cfg=estored.model), eparams))
        log.info("ensemble member %s: backbone=%s", w, estored.model.backbone)

    divisor = max([required_divisor(cfg.model)]
                  + [required_divisor(m.cfg) for m, _ in members])
    # in tiled mode the network sees tile_size² tiles; only that side must
    # be divisible (the slide canvas itself has no constraint)
    side_checked = cfg.infer.tile_size if tiled else cfg.infer.input_size
    side_flag = "--tile_size" if tiled else "--input_size"
    if side_checked % divisor:
        raise SystemExit(
            f"{side_flag} {side_checked} must be divisible by "
            f"{divisor} for backbone {cfg.model.backbone} "
            f"(hg_depth {cfg.model.hg_depth}); TTA scale sides are rounded "
            f"to multiples automatically")

    if cfg.infer.weights:
        # fail fast + clearly on structure mismatch (wrong --backbone/--norm
        # flags for this checkpoint, or a checkpoint from an older layout)
        expect = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
        expect_vars = ({"params": expect.params, "batch_stats": expect.batch_stats}
                       if expect.batch_stats is not None else expect.params)
        got_paths = {jax.tree_util.keystr(p)
                     for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
        want_paths = {jax.tree_util.keystr(p)
                      for p, _ in jax.tree_util.tree_flatten_with_path(expect_vars)[0]}
        if got_paths != want_paths:
            missing = sorted(want_paths - got_paths)[:5]
            extra = sorted(got_paths - want_paths)[:5]
            raise SystemExit(
                f"checkpoint {cfg.infer.weights} does not match the model built "
                f"from the CLI flags (--backbone {cfg.model.backbone}, --norm "
                f"{cfg.model.norm}, --num_stacks {cfg.model.num_stacks}).\n"
                f"  sample missing keys: {missing}\n  sample extra keys: {extra}")
        log.info("loaded weights from %s%s", cfg.infer.weights,
                 " (EMA)" if getattr(args, "use_ema", False) else "")
        # FALLBACK ONLY: when wh-head size pruning is unavailable (old
        # checkpoint without the head, or --size_prune 0), derive a hard
        # size cap from the checkpoint's dataset stats; the stored side is
        # in TRAIN-canvas pixels — rescale to the inference canvas.  With
        # size_prune active (the default) no dataset prior is needed.
        if (getattr(args, "max_box_size", 0) == 0
                and (cfg.group.size_prune <= 0 or not cfg.model.use_wh_head)):
            side = float(ck_extra.get("max_gt_box_side_px", 0.0))
            train_canvas = float(ck_extra.get("train_input_size", 0.0))
            if side > 0 and train_canvas > 0:
                canvas = (cfg.infer.tile_size if tiled
                          else cfg.infer.input_size)
                # tiles crop (not resize) the slide, so the object scale on
                # a tile follows the SLIDE canvas
                if tiled:
                    canvas = cfg.infer.input_size
                side_here = side * canvas / train_canvas
                cap = 1.5 * side_here / cfg.data.stride
                cfg = dataclasses.replace(
                    cfg, group=dataclasses.replace(cfg.group,
                                                   max_box_size=cap))
                log.info("size prior from checkpoint stats: max box side "
                         "%.1f stride px (1.5 x %.0f px GT max, canvas "
                         "rescaled %.0f -> %.0f)", cap, side, train_canvas,
                         canvas)
    else:
        log.warning("no --weights given: running with random init")
        params = train_lib.create_train_state(cfg, jax.random.PRNGKey(0)).params

    model = KGNet(cfg=cfg.model)
    scales = cfg.infer.test_scales
    multiscale = tuple(scales) != (1.0,) or cfg.infer.test_flip
    if tiled and multiscale:
        raise SystemExit("--tiled and multi-scale --test_scales are exclusive")
    n_dev = getattr(args, "num_devices", 0) or 1
    mesh = None
    if n_dev > 1:
        from kgtpu.parallel import make_mesh
        mesh = make_mesh(n_dev)
        log.info("batch-DP inference over %d devices", n_dev)
        if cfg.infer.batch_size % n_dev:
            raise SystemExit(
                f"--batch_size {cfg.infer.batch_size} must be divisible by "
                f"--ngpus {n_dev}")
    if tiled:
        from kgtpu.infer import build_tiled_infer_fn
        infer = build_tiled_infer_fn(
            model, cfg, (cfg.infer.input_size, cfg.infer.input_size),
            mesh=mesh)
    elif members:
        if mesh is not None:
            raise SystemExit("--ngpus and --ensemble are exclusive")
        from kgtpu.infer import build_ensemble_fn
        ens = build_ensemble_fn([model] + [m for m, _ in members], cfg,
                                mask_member=0)
        all_params = [params] + [p_ for _, p_ in members]
        # the data loop passes the primary params; the ensemble fn needs
        # every member's — close over the full list
        infer = lambda _p, imgs: ens(all_params, imgs)  # noqa: E731
    elif multiscale:
        infer = build_multiscale_fn(model, cfg)
        if mesh is not None:
            raise SystemExit("--ngpus applies to the single-scale and "
                             "--tiled paths (TTA is per-scale-shaped)")
    else:
        infer = build_infer_fn(model, cfg, mesh=mesh)
    ds = build_dataset(cfg.data, split="test")
    os.makedirs(cfg.infer.save_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    base = cfg.infer.input_size

    if getattr(args, "profile_dir", ""):
        jax.profiler.start_trace(args.profile_dir)

    save_vis = getattr(args, "save_vis", False)
    coco_records = [] if getattr(args, "coco_json", "") else None

    def write_result(iid, label, boxes, dscores, dvalid, image=None):
        if coco_records is not None:
            # slot-aligned full arrays: label id i+1 <-> boxes[i]/dscores[i]
            coco_records.append({"id": iid, "label_map": label,
                                 "boxes": boxes, "scores": dscores})
        cv2.imwrite(os.path.join(cfg.infer.save_dir, f"{iid}_label.png"),
                    label.astype(np.uint16))
        if save_vis and image is not None:
            from kgtpu.visualize import draw_instances
            # images stay raw uint8 end-to-end now (device-side normalize)
            vis = draw_instances(image, label, boxes, dscores, dvalid)
            cv2.imwrite(os.path.join(cfg.infer.save_dir, f"{iid}_vis.png"),
                        cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        rec = {
            "id": iid,
            "boxes": boxes[dvalid].tolist(),
            "scores": dscores[dvalid].tolist(),
            "num_instances": int(dvalid.sum()),
        }
        with open(os.path.join(cfg.infer.save_dir, f"{iid}.json"), "w") as f:
            json.dump(rec, f)
        return rec

    summary = []
    t0 = time.time()
    if tiled:
        from kgtpu.native import renumber_label_map as native_renumber
        for i in range(len(ds)):
            raw = ds[i]
            iid = raw.get("id", f"img_{i:05d}")
            s = _prepare_sample(raw, cfg.data, augment=False, rng=rng,
                                image_only=True)
            out = infer(params, s["image"])
            lab = np.asarray(out["label_map"])
            scores_full = np.asarray(out["scores"])   # [T*D], slot-aligned
            boxes_full = np.asarray(out["boxes"])
            ids = np.unique(lab)
            ids = ids[ids > 0].astype(np.int32)
            # renumber to contiguous 1..P and align scores/boxes to new ids
            relab = native_renumber(lab, ids)
            if relab is None:   # no native toolchain
                relab = np.zeros_like(lab)
                for k, oid in enumerate(ids):
                    relab[lab == oid] = k + 1
            sc = scores_full[ids - 1]
            bx = boxes_full[ids - 1]
            summary.append(write_result(
                iid, relab, bx, sc, np.ones(len(ids), bool),
                image=s["image"]))
            if i % 5 == 0:
                log.info("%d/%d (%.2f slides/s)", i + 1, len(ds),
                         (i + 1) / max(time.time() - t0, 1e-6))
    elif multiscale or members:
        # batched TTA / ensemble: per-scale image stacks, last chunk padded
        bs = max(cfg.infer.batch_size, 1)
        done = 0
        for start in range(0, len(ds), bs):
            idxs = list(range(start, min(start + bs, len(ds))))
            raws = [ds[i] for i in idxs]      # one dataset read per image
            imgs = {}
            for sc in scales:
                side = max(round(base * sc / divisor), 1) * divisor
                dcfg = dataclasses.replace(cfg.data, input_size=side)
                stack = [
                    _prepare_sample(raw, dcfg, augment=False, rng=rng,
                                    image_only=True)["image"]
                    for raw in raws]
                imgs[f"{sc:g}"] = np.stack(
                    stack + [stack[-1]] * (bs - len(stack)))
            out = infer(params, imgs)
            for k, i in enumerate(idxs):
                iid = raws[k].get("id", f"img_{i:05d}")
                summary.append(write_result(
                    iid, np.asarray(out["label_map"][k]),
                    np.asarray(out["boxes"][k]),
                    np.asarray(out["scores"][k]),
                    np.asarray(out["valid"][k]),
                    image=np.asarray(imgs["1"][k])))
            done += len(idxs)
            log.info("%d/%d (%.2f img/s)", done, len(ds),
                     done / max(time.time() - t0, 1e-6))
    else:
        # batched single-scale path: fixed batch, last chunk padded
        bs = max(cfg.infer.batch_size, 1)
        done = 0
        for start in range(0, len(ds), bs):
            idxs = list(range(start, min(start + bs, len(ds))))
            raws = [ds[i] for i in idxs]      # one dataset read per image
            samples = [
                _prepare_sample(raw, cfg.data, augment=False, rng=rng,
                                image_only=True)
                for raw in raws]
            imgs = np.stack([s["image"] for s in samples]
                            + [samples[-1]["image"]] * (bs - len(samples)))
            out = infer(params, imgs)
            for k, i in enumerate(idxs):
                iid = raws[k].get("id", f"img_{i:05d}")
                summary.append(write_result(
                    iid, np.asarray(out["label_map"][k]),
                    np.asarray(out["boxes"][k]),
                    np.asarray(out["scores"][k]),
                    np.asarray(out["valid"][k]),
                    image=samples[k]["image"]))
            done += len(idxs)
            log.info("%d/%d (%.2f img/s)", done, len(ds),
                     done / max(time.time() - t0, 1e-6))

    if getattr(args, "profile_dir", ""):
        jax.profiler.stop_trace()

    with open(os.path.join(cfg.infer.save_dir, "detections.json"), "w") as f:
        json.dump({"images": summary, "input_size": base,
                   "test_scales": list(scales),
                   "ensemble": [x for x in
                                getattr(args, "ensemble", "").split(",")
                                if x]}, f)
    if coco_records is not None:
        from kgtpu.coco_export import write_coco_json
        n = write_coco_json(args.coco_json, coco_records)
        log.info("wrote %d COCO instance records to %s", n, args.coco_json)
    log.info("wrote %d results to %s (%.2f img/s end-to-end)",
             len(summary), cfg.infer.save_dir,
             len(summary) / max(time.time() - t0, 1e-6))


if __name__ == "__main__":
    main()
