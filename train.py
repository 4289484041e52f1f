#!/usr/bin/env python
"""Training CLI — mirrors the reference's train.py entry point.  [SURVEY.md C1, C14]

Example:
  python train.py --dataset synthetic --num_epochs 2 --steps_per_epoch 20 \
      --batch_size 4 --input_size 128 --save_dir /tmp/weights
"""

from __future__ import annotations

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from kgtpu.config import build_train_parser, config_from_train_args

    args = build_train_parser().parse_args()
    cfg = config_from_train_args(args)

    import jax

    # explicit platform override for CPU-backend CLI runs (the axon
    # sitecustomize pins jax_platforms, so the env var alone is ignored)
    if os.environ.get("KGTPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["KGTPU_PLATFORM"])

    from kgtpu.utils import enable_compilation_cache
    enable_compilation_cache()

    # multi-host DP: same command on every host, before any device query
    if getattr(args, "coordinator", ""):
        from kgtpu.parallel import multihost
        multihost.initialize(args.coordinator, args.num_hosts, args.host_id)

    if getattr(args, "debug_nans", False):
        from kgtpu.utils import enable_nan_debugging
        enable_nan_debugging()

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("kgtpu.train")

    from kgtpu import checkpoint, train_lib
    from kgtpu.data import batch_iterator, build_dataset, stack_batches
    from kgtpu.models import KGNet, required_divisor
    from kgtpu.parallel import make_mesh, multihost, replicated, shard_batch

    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    if cfg.data.dataset == "folder":
        raise SystemExit("--dataset folder is inference-only (no "
                         "annotations); train on dsb2018/neural_cells/coco/"
                         "synthetic* instead")
    divisor = required_divisor(cfg.model)
    if cfg.data.input_size % divisor:
        raise SystemExit(
            f"--input_size {cfg.data.input_size} must be divisible by "
            f"{divisor} for backbone {cfg.model.backbone} "
            f"(hg_depth {cfg.model.hg_depth})")

    import dataclasses

    tcfg = cfg.train
    ds = build_dataset(cfg.data, split="train")
    steps_per_epoch = tcfg.steps_per_epoch or max(len(ds) // tcfg.batch_size, 1)
    # write the derived value back so schedule construction sees it (the
    # cosine schedule needs total steps; with steps_per_epoch=0 it would
    # silently fall back to constant)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(tcfg, steps_per_epoch=steps_per_epoch))
    tcfg = cfg.train
    log.info("dataset=%s n=%d steps/epoch=%d devices=%s",
             cfg.data.dataset, len(ds), steps_per_epoch,
             [d.platform for d in jax.devices()])

    rng = jax.random.PRNGKey(tcfg.seed)
    state = train_lib.create_train_state(cfg, rng)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log.info("model=%s params=%.2fM", cfg.model.backbone, n_params / 1e6)

    start_epoch = 0
    if tcfg.resume:
        src = tcfg.save_dir if tcfg.resume == "latest" else tcfg.resume
        out = checkpoint.restore(src, state=state)
        state, start_epoch = out["state"], out["epoch"] + 1
        log.info("resumed from %s at epoch %d", src, start_epoch)
    elif tcfg.init_from:
        state = checkpoint.init_params_from(state, tcfg.init_from)
        log.info("initialized params from %s (fresh optimizer/epoch)",
                 tcfg.init_from)

    n_dev = tcfg.num_devices or jax.device_count()
    if n_proc > 1 and tcfg.batch_size % n_proc:
        raise SystemExit(f"--batch_size {tcfg.batch_size} (global) must "
                         f"divide by the {n_proc} hosts")
    if n_proc > 1 and n_dev != jax.device_count():
        # a mesh over a device prefix would exclude some hosts' devices
        # entirely (their batch shards would have nowhere to land)
        raise SystemExit(f"--ngpus {tcfg.num_devices} is incompatible with "
                         f"multi-host: the mesh must span all "
                         f"{jax.device_count()} global devices (omit the "
                         "flag or pass 0)")
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    model = KGNet(cfg=cfg.model)
    step_fn = train_lib.make_train_step(model, cfg, mesh=mesh)
    k_dispatch = max(tcfg.steps_per_dispatch, 1)
    multi_fn = (train_lib.make_train_multi_step(model, cfg, k_dispatch,
                                                mesh=mesh)
                if k_dispatch > 1 else None)
    if k_dispatch > 1:
        log.info("multi-step dispatch: %d steps per jitted call", k_dispatch)
    if mesh is not None:
        if n_proc == 1:
            state = jax.device_put(state, replicated(mesh))
        # multi-host: the state stays host-side until the first step; jit's
        # replicated in_sharding commits it globally (every host constructs
        # the identical value from the same seed / the same checkpoint)
        log.info("data-parallel over %d devices on %d host(s)", n_dev,
                 n_proc)

    profile_dir = getattr(args, "profile_dir", "")
    metrics_path = os.path.join(tcfg.save_dir, "metrics.jsonl")
    os.makedirs(tcfg.save_dir, exist_ok=True)

    # host-RSS watchdog (SURVEY §5 failure recovery): the remote-TPU tunnel
    # client leaks host memory per dispatch (~15 MB/step measured; the kgtpu
    # step path holds RSS flat on the CPU backend), so a multi-hour run gets
    # OOM-killed mid-schedule. Past the limit we checkpoint and re-exec with
    # --resume at an epoch boundary — clean heap, zero lost epochs.
    from kgtpu.utils.host import (default_rss_limit_gb, host_rss_gb,
                                  reexec, restart_argv)
    rss_limit = (default_rss_limit_gb() if tcfg.rss_limit_gb < 0
                 else tcfg.rss_limit_gb)
    if rss_limit:
        log.info("host-RSS watchdog armed at %.1f GB%s", rss_limit,
                 " (coordinated: max RSS across hosts)" if n_proc > 1
                 else "")

    # dataset size statistics, stored with every checkpoint: test.py derives
    # the grouper's ghost-killing size prior from them (DESIGN.md rule 3).
    # Scanned over the FULL dataset — a partial scan in dataset order can
    # under-estimate the max on heterogeneous data (e.g. DSB2018's ~10x
    # nuclei-scale spread) and silently make larger instances undetectable.
    # Boxes come from the RAW label map (native single-pass sweep) and sides
    # are rescaled to the train canvas, so no image resize is needed.
    import numpy as np

    from kgtpu.data.transforms import boxes_from_label_map
    sides = []
    t_stats = time.time()
    for i in range(len(ds)):
        lab = ds[i]["label_map"]
        # truncation to max_instances keeps the BIGGEST instances, so the
        # max side is preserved exactly
        bx, v, _ = boxes_from_label_map(lab, cfg.data.max_instances)
        if v.sum():
            wh = np.maximum(bx[v > 0, 2] - bx[v > 0, 0],
                            bx[v > 0, 3] - bx[v > 0, 1])
            sides.extend(wh * (cfg.data.input_size / max(lab.shape)))
    sides = np.asarray(sides, np.float32)
    max_side = float(sides.max()) if sides.size else 0.0
    p99_side = float(np.percentile(sides, 99)) if sides.size else 0.0
    data_stats = {
        "max_gt_box_side_px": np.asarray(max_side, np.float32),
        "p99_gt_box_side_px": np.asarray(p99_side, np.float32),
        # consumers rescale the size prior when inferring at another canvas
        "train_input_size": np.asarray(cfg.data.input_size, np.float32),
        # self-describing checkpoints: test.py/Predictor rebuild the model
        # architecture from this; CLI flags become overrides
        "config_json": checkpoint.encode_config(cfg),
    }
    log.info("dataset stats over all %d images (%.1fs): GT box side "
             "max %.1f / p99 %.1f px at canvas %d (stored in checkpoints)",
             len(ds), time.time() - t_stats, max_side, p99_side,
             cfg.data.input_size)

    # --- optional in-training evaluation (--eval_every) -------------------
    # one infer program compiled lazily on first use; raw and EMA params run
    # through the SAME compiled fn (param values are runtime inputs)
    eval_state = {}
    best_val = {"epoch": -1, "metric": -1.0}
    _best_marker = os.path.join(tcfg.save_dir, "best.json")
    if tcfg.resume and os.path.isfile(_best_marker):
        import json as _json
        with open(_best_marker) as f:
            best_val = _json.load(f)   # don't let a resumed run regress it

    def run_eval(params):
        if not eval_state:
            from kgtpu.data.loader import _prepare_sample
            from kgtpu.infer import build_infer_fn
            # VAL split — distinct from the test split that test.py/eval.py
            # report final numbers on; selecting `best` on test would leak
            # the final eval set into model selection
            vds = build_dataset(cfg.data, split="val")
            vrng = np.random.default_rng(0)
            # capped: this is a training-progress signal, not the final
            # eval — full-split numbers come from test.py + eval.py
            samples = [_prepare_sample(vds[i], cfg.data, augment=False,
                                       rng=vrng)
                       for i in range(min(len(vds), 32))]
            eval_state["imgs"] = jax.numpy.asarray(
                np.stack([s["image"] for s in samples]))
            eval_state["gts"] = [s["label_map"] for s in samples]
            eval_state["fn"] = build_infer_fn(model, cfg)
        from kgtpu import evaluate
        if state.batch_stats is not None:
            # BatchNorm models: inference applies with use_running_average,
            # which needs the batch_stats collection alongside params (the
            # same full-variables contract restore_bundle gives test.py)
            params = {"params": params, "batch_stats": state.batch_stats}
        if mesh is not None:
            # params live replicated on the mesh; the eval program is a
            # plain single-device jit — round-trip through host numpy
            params = jax.tree.map(np.asarray, params)
        # Chunked dispatches, one heartbeat log line each: a single 32-img
        # eval dispatch measured 23 min on a slow tunnel, long enough for
        # the tpu_watch_resume.sh stall detector (15 min default) to kill
        # a perfectly healthy trainer mid-eval — and since the epoch
        # checkpoint saves only after eval, that livelocks the run.  Per-
        # image outputs are batch-independent (the batch-level chunk-skip
        # predicates only skip work when no image in the chunk needs it),
        # so chunking changes nothing but dispatch granularity.
        chunk = 8
        n = eval_state["imgs"].shape[0]
        labs_l, scs_l = [], []
        for i0 in range(0, n, chunk):
            out = eval_state["fn"](params, eval_state["imgs"][i0:i0 + chunk])
            labs_l.append(np.asarray(out["label_map"]))
            scs_l.append(np.asarray(out["scores"]))
            log.info("held-out eval %d/%d", min(i0 + chunk, n), n)
        labs = np.concatenate(labs_l)
        scs = np.concatenate(scs_l)
        recs = [{"pred_label": labs[i], "scores": scs[i],
                 "gt_label": eval_state["gts"][i]}
                for i in range(len(eval_state["gts"]))]
        r = evaluate.evaluate_dsb2018(recs)
        rc = evaluate.evaluate_coco(recs)
        return {"val_mAP_dsb": round(r["mAP_dsb2018"], 4),
                "val_AP_coco": round(rc["AP_coco"], 4),
                "val_AP50": round(rc["AP50"], 4),
                "val_AJI": round(evaluate.evaluate_aji(recs)["AJI"], 4),
                "val_PQ": round(evaluate.evaluate_pq(recs)["PQ"], 4)}

    import itertools

    for epoch in range(start_epoch, tcfg.num_epochs):
        it = batch_iterator(ds, cfg.data, tcfg.batch_size, augment=True,
                            seed=tcfg.seed + epoch, steps=steps_per_epoch,
                            process_id=jax.process_index(),
                            num_processes=n_proc)
        t0, seen = time.time(), 0
        if profile_dir and epoch == start_epoch and is_main:
            jax.profiler.start_trace(profile_dir)
        i = 0
        while i < steps_per_epoch:
            group = list(itertools.islice(it, k_dispatch))
            if not group:
                break
            if multi_fn is not None and len(group) == k_dispatch:
                # k steps in ONE dispatch: stack batches on a leading steps
                # axis, scan on device.  Same update sequence as the
                # single-step path (per-step keys fold the same offsets).
                stacked = stack_batches(group)
                if n_proc > 1:
                    stacked = multihost.global_batch(stacked, mesh,
                                                     stacked=True)
                offs = (np.arange(i, i + k_dispatch, dtype=np.int32)
                        + epoch * 100_000)
                state, ms = multi_fn(state, stacked, rng, offs)
                metrics = jax.tree.map(lambda a: a[-1], ms)
                log_now = (i // k_dispatch) % max(20 // k_dispatch, 1) == 0
                i += k_dispatch
            else:
                # k==1, or the epoch tail that doesn't fill a dispatch group
                for batch in group:
                    if n_proc > 1:
                        batch = multihost.global_batch(batch, mesh)
                    elif mesh is not None:
                        batch = shard_batch(batch, mesh)
                    state, metrics = step_fn(
                        state, batch,
                        jax.random.fold_in(rng, epoch * 100_000 + i))
                    i += 1
                log_now = (i - len(group)) % 20 == 0 or k_dispatch > 1
            seen += tcfg.batch_size * len(group)
            if log_now and is_main:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                log.info("epoch %d step %d/%d %s (%.1f img/s)",
                         epoch, i - 1, steps_per_epoch, m,
                         seen / max(time.time() - t0, 1e-6))
        if profile_dir and epoch == start_epoch and is_main:
            jax.profiler.stop_trace()
            log.info("profile written to %s", profile_dir)
        val = {}
        if (tcfg.eval_every_epochs
                and (epoch + 1) % tcfg.eval_every_epochs == 0):
            t_ev = time.time()
            val = run_eval(state.params)
            if state.ema_params is not None:
                val.update({k + "_ema": v for k, v in
                            run_eval(state.ema_params).items()})
            log.info("epoch %d held-out eval (%.0fs): %s",
                     epoch, time.time() - t_ev, val)
            # best-checkpoint tracking: the deployable metric is the EMA
            # mAP when EMA is on (what --use_ema evals), else the raw one.
            # Multi-host: the main host's value rules — hosts computing the
            # float independently could straddle the > comparison and make
            # mismatched checkpoint.save calls (a collective) below
            cur = multihost.broadcast_scalar(
                val.get("val_mAP_dsb_ema", val["val_mAP_dsb"]))
            if cur > best_val["metric"]:
                best_val.update(epoch=epoch, metric=cur)
                new_best = True
                on_save_grid = ((epoch + 1) % tcfg.save_every_epochs == 0
                                or epoch == tcfg.num_epochs - 1)
                if not on_save_grid:   # the regular branch below saves it
                    checkpoint.save(tcfg.save_dir, epoch, state,
                                    extra=data_stats, block=False)
            else:
                new_best = False
        else:
            new_best = False
        # structured per-epoch metrics (SURVEY.md §5 observability).
        # File writes are main-host-only (multi-host runs share the FS);
        # checkpoint.save/wait run on EVERY host — orbax coordinates the
        # processes and writes once.
        import json
        if is_main:
            with open(metrics_path, "a") as f:
                f.write(json.dumps({
                    "epoch": epoch,
                    **{k: round(float(v), 6) for k, v in metrics.items()},
                    **val,
                    "img_per_sec": round(
                        seen / max(time.time() - t0, 1e-6), 2),
                    "host_rss_gb": round(host_rss_gb(), 2),
                }) + "\n")
        saved_this_epoch = (
            (epoch + 1) % tcfg.save_every_epochs == 0
            or epoch == tcfg.num_epochs - 1)
        if saved_this_epoch:
            if tcfg.keep_last and is_main:
                # prune BEFORE the new async save: only finalized dirs are
                # candidates, the in-flight write is never touched
                for p in checkpoint.prune(tcfg.save_dir, tcfg.keep_last):
                    log.info("pruned %s (--keep_last %d)", p, tcfg.keep_last)
            # async: the disk write overlaps the next epoch's steps; orbax
            # queues/serializes saves, and wait() below flushes before exit
            path = checkpoint.save(tcfg.save_dir, epoch, state,
                                   extra=data_stats, block=False)
            log.info("saving %s (async)", path)
        if new_best:
            # only point best.json at model_<epoch> once the (async) save
            # has finalized — a crash in the window would otherwise leave
            # `<dir>/best` resolving to a checkpoint that never landed
            checkpoint.wait()
            import json as _json
            if is_main:
                with open(os.path.join(tcfg.save_dir, "best.json"),
                          "w") as f:
                    _json.dump(best_val, f)
            log.info("new best val mAP %.4f at epoch %d -> best.json "
                     "(use --weights %s/best)", best_val["metric"], epoch,
                     tcfg.save_dir)
        rss = host_rss_gb()
        if rss_limit and n_proc > 1:
            # every host must reach the SAME restart decision (the saves
            # below are collectives): gate on the cluster-wide max RSS
            rss = multihost.all_hosts_max(rss)
        if rss_limit and rss > rss_limit and epoch < tcfg.num_epochs - 1:
            if not saved_this_epoch:
                checkpoint.save(tcfg.save_dir, epoch, state,
                                extra=data_stats, block=False)
            checkpoint.wait()
            log.warning("host RSS %.1f GB > limit %.1f GB — checkpoint "
                        "flushed at epoch %d, re-exec'ing with --resume",
                        rss, rss_limit, epoch)
            reexec(restart_argv(sys.argv))
    checkpoint.wait()
    log.info("all checkpoints flushed")


if __name__ == "__main__":
    main()
