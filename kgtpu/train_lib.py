"""Jitted, sharded train step.  [SURVEY.md C14; §3.1 rebuilt]

The reference's per-step host work (target rendering in DataLoader workers,
batch.to(device), loss prints) collapses into ONE jitted program here:

  batch (host, fixed shapes) → [device] render gaussian targets → forward
  → focal/offset/mask losses → grads → all-reduce (mesh) → optax update

Data parallelism is jit-with-shardings over a 1-axis mesh: batch arrays
sharded on axis 0, state replicated; XLA inserts the gradient all-reduce
over ICI (SURVEY.md §2.10).  The returned metrics dict is the only thing
that ever leaves the device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from kgtpu import losses
from kgtpu.config import Config
from kgtpu.models import KGNet
from kgtpu.ops import targets as targets_ops
from kgtpu.ops.preprocess import normalize_images
from kgtpu.ops.roi import crop_and_resize
from kgtpu.parallel import batch_sharding, replicated, stacked_batch_sharding


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm stats and optional EMA params."""

    batch_stats: Any = None
    ema_params: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    tcfg = cfg.train
    # warm up from 5% of peak (not 0 — a 0 init makes step 0 a no-op)
    warmup = max(tcfg.lr_warmup_steps, 1)
    if tcfg.lr_schedule == "cosine" and tcfg.steps_per_epoch > 0:
        total = max(tcfg.num_epochs * tcfg.steps_per_epoch, warmup + 1)
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.05 * tcfg.lr, peak_value=tcfg.lr,
            warmup_steps=warmup, decay_steps=total,
            end_value=tcfg.lr / 100.0)
    else:
        sched = optax.warmup_constant_schedule(
            init_value=0.05 * tcfg.lr, peak_value=tcfg.lr,
            warmup_steps=warmup)
    chain = [optax.clip_by_global_norm(tcfg.grad_clip_norm)]
    if tcfg.weight_decay > 0:
        chain.append(optax.adamw(sched, weight_decay=tcfg.weight_decay))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)


def create_train_state(cfg: Config, rng: jax.Array) -> TrainState:
    model = KGNet(cfg=cfg.model)
    h = w = cfg.data.input_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(rng, dummy, method=KGNet.init_all)
    ema = (jax.tree.map(jnp.copy, variables["params"])
           if cfg.train.ema_decay > 0 else None)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"), ema_params=ema,
        tx=make_optimizer(cfg))


def _jitter_boxes(boxes: jnp.ndarray, valid: jnp.ndarray, rng: jax.Array,
                  frac: float) -> jnp.ndarray:
    """Perturb box corners by ±frac·(w,h) — the mask head trains on imperfect
    boxes so it tolerates stage-1 localization noise at inference."""
    wh = jnp.stack([boxes[..., 2] - boxes[..., 0],
                    boxes[..., 3] - boxes[..., 1]], axis=-1)
    noise = jax.random.uniform(rng, boxes.shape, minval=-frac, maxval=frac)
    delta = noise * jnp.concatenate([wh, wh], axis=-1)
    out = boxes + delta
    # keep jittered boxes non-degenerate
    x0 = jnp.minimum(out[..., 0], out[..., 2] - 1.0)
    y0 = jnp.minimum(out[..., 1], out[..., 3] - 1.0)
    return jnp.stack([x0, y0, out[..., 2], out[..., 3]], axis=-1)


def loss_fn(params, batch: dict, rng: jax.Array, model: KGNet, cfg: Config,
            batch_stats=None) -> tuple[jnp.ndarray, dict]:
    s = cfg.data.stride
    tcfg = cfg.train
    # raw uint8 pixels in, normalize + color-jitter on device (ops.preprocess)
    images = normalize_images(batch["image"], cfg.data.mean, cfg.data.std,
                              batch.get("img_gain"), batch.get("img_bias"))
    b, h, w, _ = images.shape
    hs, ws = h // s, w // s

    boxes_px = batch["boxes"]                       # [B, N, 4] input pixels
    valid = batch["valid"]                          # [B, N]
    boxes_st = boxes_px / s                         # stride coords
    kpts = targets_ops.keypoints_from_boxes(boxes_st)            # [B, N, 5, 2]
    # clamp keypoints INTO the heatmap: border-touching instances have
    # exclusive corners at exactly ws/hs, which would otherwise splat
    # off-map and never receive positive supervision (CornerNet-style clamp)
    kpts = jnp.stack(
        [jnp.clip(kpts[..., 0], 0.0, ws - 1e-3),
         jnp.clip(kpts[..., 1], 0.0, hs - 1e-3)], axis=-1)
    sizes = jnp.stack([boxes_st[..., 3] - boxes_st[..., 1],
                       boxes_st[..., 2] - boxes_st[..., 0]], axis=-1)

    if tcfg.target_renderer == "pallas":
        # row-tiled TPU kernel that skips instances out of splat reach
        # (ops/pallas/gaussian.py); interpret mode keeps CPU tests runnable.
        # make_train_step forces this back to "scan" under a mesh.
        from kgtpu.ops.pallas.gaussian import render_heatmaps_pallas
        interp = jax.default_backend() != "tpu"
        hm_t = jax.vmap(lambda k, sz, v: render_heatmaps_pallas(
            k, sz, v, hs, ws, interpret=interp))(kpts, sizes, valid)
        hm_t = jax.lax.stop_gradient(hm_t)
    else:
        hm_t = jax.lax.stop_gradient(
            targets_ops.render_heatmaps_batch(kpts, sizes, valid, hs, ws))

    use_bn = batch_stats is not None
    variables = {"params": params}
    if use_bn:
        variables["batch_stats"] = batch_stats
    if use_bn:
        out, mut = model.apply(variables, images, True,
                               mutable=["batch_stats"])
        new_stats = mut["batch_stats"]
    else:
        out = model.apply(variables, images, True)
        new_stats = None
    stacks = out["stacks"]

    # --- keypoint losses, averaged over stacks (intermediate supervision) --
    l_hm = jnp.mean(jnp.stack([
        losses.focal_loss(st["hm"], hm_t, tcfg.focal_alpha, tcfg.focal_beta)
        for st in stacks]))
    l_off = jnp.mean(jnp.stack([
        jnp.mean(jax.vmap(losses.offset_loss)(st["reg"], kpts, valid))
        for st in stacks]))
    total = tcfg.w_heatmap * l_hm + tcfg.w_offset * l_off
    metrics = {"loss_hm": l_hm, "loss_off": l_off}

    if cfg.model.use_wh_head:
        l_wh = jnp.mean(jnp.stack([
            jnp.mean(jax.vmap(losses.wh_loss)(st["wh"], boxes_st, valid))
            for st in stacks]))
        total = total + tcfg.w_wh * l_wh
        metrics["loss_wh"] = l_wh

    # --- stage-2 mask head on jittered GT boxes ---------------------------
    # sample r RANDOM valid instances per image per step: slots are
    # area-ranked, so taking the first r would train the mask head only on
    # the largest cells and degrade small-instance masks
    r = tcfg.mask_train_rois
    rng_sel, rng_jit = jax.random.split(rng)
    sel_key = jax.random.uniform(rng_sel, valid.shape) * valid       # [B, N]
    _, sel = jax.lax.top_k(sel_key, r)                               # [B, r]
    roi_boxes = jnp.take_along_axis(boxes_px, sel[..., None], axis=1)
    roi_valid = jnp.take_along_axis(valid, sel, axis=1)
    roi_ids = (sel + 1).astype(jnp.float32)                          # label ids
    roi_boxes_px = _jitter_boxes(roi_boxes, roi_valid, rng_jit,
                                 tcfg.roi_jitter)
    m = cfg.model.mask_size
    rs = cfg.model.roi_size

    # crops are pure; one flat mask-head apply keeps BatchNorm stats unvmapped
    crops = jax.vmap(
        lambda f, bx: crop_and_resize(f, bx / s, rs)
    )(out["feat"], roi_boxes_px)                     # [B, R, rs, rs, F]
    flat_crops = crops.reshape((b * r,) + crops.shape[2:])
    if use_bn:
        flat_logits, mut2 = model.apply(
            variables, flat_crops, True, method=KGNet.apply_mask_head,
            mutable=["batch_stats"])
        # merge: the mask-head subtree comes from the second apply
        new_stats = {**new_stats, **{k: v for k, v in
                                     mut2["batch_stats"].items()
                                     if k == "mask_head"}}
    else:
        flat_logits = model.apply(variables, flat_crops, True,
                                  method=KGNet.apply_mask_head)
    mask_logits = flat_logits.reshape(b, r, m, m)

    def per_image_gt(label_map, rb_px, ids):
        crops = crop_and_resize(label_map[..., None].astype(jnp.float32),
                                rb_px, m, method="nearest")[..., 0]
        return (crops == ids[:, None, None]).astype(jnp.float32)  # [R, m, m]

    gt_masks = jax.vmap(per_image_gt)(batch["label_map"], roi_boxes_px,
                                      roi_ids)
    l_mask = jnp.mean(jax.vmap(losses.mask_loss)(mask_logits, gt_masks,
                                                 roi_valid))
    total = total + tcfg.w_mask * l_mask
    metrics["loss_mask"] = l_mask
    metrics["loss"] = total
    return total, (metrics, new_stats)


def _train_step_body(state: TrainState, batch: dict, rng: jax.Array,
                     model: KGNet, cfg: Config):
    """One optimization step (traceable; shared by the single-step jit and
    the multi-step `lax.scan` dispatch)."""
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (metrics, new_stats)), grads = grad_fn(
        state.params, batch, rng, model, cfg, state.batch_stats)
    new_state = state.apply_gradients(grads=grads)
    if new_stats is not None:
        new_state = new_state.replace(batch_stats=new_stats)
    if state.ema_params is not None:
        # EMA warmup (TF-style): effective decay min(d, (1+t)/(10+t)).
        # A flat d=0.999 leaves 0.999^t of the RANDOM INIT in the
        # average — 81% after a 208-step run — which silently zeroed
        # short-schedule --use_ema evals (round-2 debugging: mAP 0.0 on
        # every run under ~1k steps).  With warmup the early EMA tracks
        # the raw params and converges to d as t grows.
        d = cfg.train.ema_decay
        t = new_state.step.astype(jnp.float32)
        d_t = jnp.minimum(d, (1.0 + t) / (10.0 + t))
        new_state = new_state.replace(ema_params=jax.tree.map(
            lambda e, p: e * d_t + p * (1.0 - d_t),
            state.ema_params, new_state.params))
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def _mesh_safe(cfg: Config, mesh) -> Config:
    """Force the scan target renderer under a mesh: pallas_call has no SPMD
    partitioning rule, and the sharded step must stay exactly partitionable
    (same policy as infer._maybe_fused)."""
    import dataclasses
    if mesh is not None and cfg.train.target_renderer != "scan":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, target_renderer="scan"))
    return cfg


def make_train_step(model: KGNet, cfg: Config, mesh=None) -> Callable:
    """Build the jitted train step.

    With a mesh, the batch is expected sharded on axis 0 ("data") and the
    state replicated; jit emits the cross-chip gradient all-reduce.
    """
    cfg = _mesh_safe(cfg, mesh)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        return _train_step_body(state, batch, rng, model, cfg)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_train_multi_step(model: KGNet, cfg: Config, n_steps: int,
                          mesh=None) -> Callable:
    """`n_steps` optimization steps inside ONE jitted dispatch.

    The remote-TPU tunnel charges ~24 ms of host dispatch per jitted call
    (benchmarks/common.py), so wall-clock training through it is
    dispatch-bound, not device-bound.  Scanning the step body over k
    device-resident batches amortizes that constant (and the per-call
    transfer latency) k-fold while computing the *same* update sequence:
    per-step RNG keys are `fold_in(rng, offsets[i])` with the offsets the
    host loop would have used, so `k` scanned steps match `k` single-step
    dispatches (equality-tested in tests/test_train.py).

    Call as `fn(state, batches, rng, offsets)` where every leaf of
    `batches` is stacked on a leading [n_steps] axis and `offsets` is an
    int32 [n_steps] vector of host step indices.  Returns
    `(state, metrics)` with each metric stacked [n_steps].

    Memory: the k batches live in HBM simultaneously — batches carry raw
    uint8 pixels + geometry only (targets render on device, DESIGN rule 4),
    so k=8 at batch 8×512² is ~60 MB.
    """
    cfg = _mesh_safe(cfg, mesh)

    def multi(state: TrainState, batches: dict, rng: jax.Array,
              offsets: jnp.ndarray):
        def body(st, xs):
            batch, off = xs
            return _train_step_body(st, batch, jax.random.fold_in(rng, off),
                                    model, cfg)
        return jax.lax.scan(body, state, (batches, offsets), length=n_steps)

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,))

    repl = replicated(mesh)
    # leading steps axis unsharded, per-step batch axis over the chips
    bsh = stacked_batch_sharding(mesh)
    return jax.jit(
        multi,
        in_shardings=(repl, bsh, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
