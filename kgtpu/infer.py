"""Inference: one jitted program from image batch to instance masks.
[SURVEY.md C15-C16; the rebuilt §3.2/§3.3 call stacks]

The reference crosses the host/device boundary O(#boxes) times per image
(decode on host, per-box crop → mask head → paste loops).  Here
`build_infer_fn` returns ONE jit-compiled function:

  images [B, H, W, 3]
    → backbone + heads                       (MXU)
    → decode_peaks (maxpool NMS + top-k)     (fixed shapes)
    → group_keypoints (keypoint-graph match)
    → box_nms
    → crop_and_resize(features, boxes) → mask head   (batched over D boxes)
    → paste_masks → per-image instance label map

Nothing touches the host until the final fetch.  Multi-scale TTA runs the
detector portion once per scale (each scale is its own compiled shape),
merges with cross-scale NMS *on device*, and runs the mask stage once on the
base-scale features.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.config import Config
from kgtpu.models import KGNet
from kgtpu.ops.decode import decode_center_wh, decode_peaks
from kgtpu.ops.group import Boxes, group_keypoints
from kgtpu.ops.nms import box_nms, merge_scales
from kgtpu.ops.preprocess import normalize_images
from kgtpu.ops.roi import crop_and_resize, paste_masks_batch
from kgtpu.ops.tiling import (
    extract_tiles,
    ownership_mask,
    ownership_rects,
    stitch_tiles,
    tile_grid,
)


def _maybe_fused(model: KGNet, cfg: Config, mesh=None) -> KGNet:
    """Swap flax GroupNorm for the Pallas fused GN(+ReLU) kernel on the
    single-chip TPU inference path (InferConfig.fused_norm; the param tree
    is identical, so the same checkpoint serves both).  Skipped under a
    mesh — pallas_call has no SPMD partitioning rule, and the sharded path
    must stay exactly partitionable (SURVEY.md §2.10)."""
    import dataclasses
    if (cfg.infer.fused_norm == "off" or mesh is not None
            or model.cfg.norm != "group"
            or jax.default_backend() != "tpu"):
        return model
    return KGNet(cfg=dataclasses.replace(model.cfg, norm="group_fused"))


def _vars(params) -> dict:
    """Accept bare params (GroupNorm models) or full variables incl.
    batch_stats (BatchNorm models)."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}


def _peak_wh(last: dict, peaks, cfg: Config, batch_idx: int | None = 0):
    """Gather the size head at each decoded peak ([5, K, 2] stride units),
    or None when the head is absent / size pruning is off."""
    if cfg.group.size_prune <= 0 or "wh" not in last:
        return None
    wh = last["wh"] if batch_idx is None else last["wh"][batch_idx]
    h, w, _ = wh.shape
    flat = wh.reshape(h * w, 2).astype(jnp.float32)
    c, k = peaks.indices.shape
    return jnp.take(flat, peaks.indices.reshape(-1), axis=0).reshape(c, k, 2)


def _decode_image(cfg: Config, hm: jnp.ndarray, reg: jnp.ndarray,
                  wh: jnp.ndarray | None) -> Boxes:
    """Per-image head maps → NMS'd Boxes (stride coords); vmapped over B."""
    if cfg.group.method == "centernet":
        cand = decode_center_wh(hm, reg, wh, cfg.group.max_detections,
                                cfg.group.score_thresh)
    else:
        peaks = decode_peaks(hm, reg, cfg.group.max_peaks_per_class)
        kp_wh = (_peak_wh({"wh": wh}, peaks, cfg, batch_idx=None)
                 if wh is not None else None)
        cand = group_keypoints(peaks, cfg.group, kp_wh=kp_wh)
    return box_nms(cand, cfg.group.nms_iou)


def _detect_batch(model: KGNet, cfg: Config, params, images: jnp.ndarray
                  ) -> tuple[Boxes, jnp.ndarray]:
    """images [B, H, W, 3] (normalized) → (Boxes stacked over B, feats).

    ONE batched model apply, then the cheap decode/group is vmapped — the
    previous vmap-of-single-image-apply form compiled the convs under a
    batching transform and measured ~25% slower (round-2 profiling).
    """
    out = model.apply(_vars(params), images)
    last = out["stacks"][-1]
    if cfg.group.method == "centernet" and "wh" not in last:
        raise ValueError(
            'group.method="centernet" needs model.use_wh_head=True')
    wh = last.get("wh")
    if wh is None:
        dets = jax.vmap(lambda h, r: _decode_image(cfg, h, r, None))(
            last["hm"], last["reg"])
    else:
        dets = jax.vmap(lambda h, r, w: _decode_image(cfg, h, r, w))(
            last["hm"], last["reg"], wh)
    return dets, out["feat"]


def _mask_probs(model: KGNet, cfg: Config, params, feats: jnp.ndarray,
                dets: Boxes) -> jnp.ndarray:
    """ROI crop + mask head → per-slot mask probabilities [B, D, m, m],
    chunk-skipping invalid detection slots (see _mask_batch docstring)."""
    b, d = dets.boxes.shape[:2]
    rs = cfg.model.roi_size
    m = cfg.model.mask_size

    def head_logits(boxes_chunk):
        crops = jax.vmap(
            lambda f, bx: crop_and_resize(f, bx, rs)
        )(feats, boxes_chunk)                             # [B, ch, r, r, F]
        flat = crops.reshape((b * boxes_chunk.shape[1],) + crops.shape[2:])
        logits = model.apply(_vars(params), flat,
                             method=KGNet.apply_mask_head)
        return logits.reshape((b, boxes_chunk.shape[1]) + logits.shape[1:])

    ch = cfg.infer.mask_chunk
    if 0 < ch < d:
        # pad D up to a chunk multiple (padded slots are invalid and their
        # chunks skip for free) — same convention as paste_masks_batch, so
        # any --mask_chunk value engages the optimization
        pad = (-d) % ch
        boxes = jnp.pad(dets.boxes, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(dets.valid, ((0, 0), (0, pad)))

        def chunk(_, i):
            bx = jax.lax.dynamic_slice_in_dim(boxes, i * ch, ch, axis=1)
            va = jax.lax.dynamic_slice_in_dim(valid, i * ch, ch, axis=1)
            lg = jax.lax.cond(jnp.any(va), lambda: head_logits(bx),
                              lambda: jnp.zeros((b, ch, m, m), jnp.float32))
            return None, lg
        _, lgs = jax.lax.scan(chunk, None, jnp.arange((d + pad) // ch))
        logits = jnp.moveaxis(lgs, 0, 1).reshape(b, d + pad, m, m)[:, :d]
    else:
        logits = head_logits(dets.boxes)
    return jax.nn.sigmoid(logits)


def _rescore_by_maskness(cfg: Config, probs: jnp.ndarray,
                         scores: jnp.ndarray, valid: jnp.ndarray,
                         gate: float | None = None
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-2 confidence rescoring (`--mask_rescore w`, SOLO/Mask-Scoring
    lineage): multiply each detection score by maskness^w, where maskness =
    mean mask probability over the pixels the mask head itself marks
    foreground.  A confident box whose mask is mushy (heavy occlusion, a
    ghost pair spanning two cells) gets discounted, and the detection-score
    gate re-applies to the rescored score so such detections drop out
    entirely (ranking-only rescoring cannot move the FP-counting DSB mAP).
    w=0 (default) is off.  Returns (scores, valid)."""
    w = cfg.infer.mask_rescore
    if w <= 0:
        return scores, valid
    fg = (probs > cfg.group.mask_thresh).astype(probs.dtype)
    maskness = ((probs * fg).sum((-2, -1))
                / jnp.maximum(fg.sum((-2, -1)), 1.0))
    scores = scores * jnp.where(valid > 0, maskness, 1.0) ** w
    if gate is None:
        gate = cfg.group.score_thresh
    return scores, valid & (scores >= gate)


def _mask_batch(model: KGNet, cfg: Config, params, feats: jnp.ndarray,
                dets: Boxes, height: int, width: int,
                rescore_gate: float | None = None) -> dict:
    """Stage 2, batched: ROI crop + mask head over the B·D detection slots
    (crop + paste are pure ops and stay vmapped per image).

    The D slots are processed in chunks of `cfg.infer.mask_chunk`, and a
    chunk whose slots hold no valid detection is skipped entirely
    (lax.cond on a scalar predicate — real control flow on TPU, not a
    select).  box_nms compacts kept rows first, so valid detections occupy
    a slot prefix and typically only the first chunk computes; the skipped
    chunks' logits are zeros, which paste_masks never reads (it gates on
    `valid`).  A non-dividing mask_chunk pads D up with invalid slots;
    mask_chunk=0 restores the dense all-slots mask-head apply (paste keeps
    its default chunking — a dense [B, D, H, W] paste would not fit HBM)."""
    s = cfg.data.stride
    probs = _mask_probs(model, cfg, params, feats, dets)
    scores, valid = _rescore_by_maskness(cfg, probs, dets.scores, dets.valid,
                                         gate=rescore_gate)
    if cfg.infer.mask_rescore > 0:
        # the rescore gate can invalidate mid-prefix slots; restore the
        # kept-first compaction every consumer relies on (label ids 1..k,
        # test.py<->eval.py slot contract) — valid slots first, rescored
        # score descending, stable on ties
        order = jnp.argsort(jnp.where(valid, -scores, jnp.inf), axis=1,
                            stable=True)
        dets = Boxes(
            boxes=jnp.take_along_axis(dets.boxes, order[..., None], axis=1),
            scores=jnp.take_along_axis(scores, order, axis=1),
            valid=jnp.take_along_axis(valid, order, axis=1))
        probs = jnp.take_along_axis(probs, order[..., None, None], axis=1)
        scores, valid = dets.scores, dets.valid
    boxes_px = dets.boxes * s
    d = dets.boxes.shape[1]
    ch = cfg.infer.mask_chunk
    # mask_chunk also sets the paste chunk; 0 (dense mask head) keeps
    # paste at its own default chunking — paste has always been chunked
    # (a [B, D, H, W] dense intermediate would not fit HBM), so "dense"
    # only meaningfully disables the mask-head scan
    label, score_map = paste_masks_batch(
        probs, boxes_px, scores, valid, height, width,
        thresh=cfg.group.mask_thresh,
        box_chunk=(ch if 0 < ch < d else 32))
    return {
        "boxes": boxes_px, "scores": scores, "valid": valid,
        "masks": probs, "label_map": label, "score_map": score_map,
    }


def build_infer_fn(model: KGNet, cfg: Config, mesh=None) -> Callable:
    """Jitted (params, images [B, H, W, 3]) → per-image detections + masks.

    Images are RAW pixels (uint8 or float 0-255); normalization runs on
    device (ops.preprocess — the host-side version was the profiled input
    bottleneck and uint8 transfers are 4× smaller).

    With `mesh`, the batch axis is sharded over the mesh's "data" axis and
    params are replicated — batch-DP inference (SURVEY.md §2.10), the
    serving analogue of the sharded train step.  Pass a batch divisible by
    the mesh size.  Every per-image stage partitions trivially; the only
    cross-chip communication is the chunk-skip predicates (one boolean
    all-reduce of `any(valid)` per detection-slot chunk, from the mask
    stage and paste scans), which also couple skipping across chips — a
    chunk computes everywhere if ANY chip has a valid detection in it.
    Sharded outputs equal single-device outputs exactly (tested).
    """

    model = _maybe_fused(model, cfg, mesh)

    def infer(params, images):
        images = normalize_images(images, cfg.data.mean, cfg.data.std)
        dets, feats = _detect_batch(model, cfg, params, images)
        return _mask_batch(model, cfg, params, feats, dets,
                           images.shape[1], images.shape[2])

    if mesh is None:
        return jax.jit(infer)
    from kgtpu.parallel import batch_sharding, replicated
    return jax.jit(infer, in_shardings=(replicated(mesh),
                                        batch_sharding(mesh)),
                   out_shardings=batch_sharding(mesh))


def build_detect_fn(model: KGNet, cfg: Config) -> Callable:
    """Jitted detector-only path (used per TTA scale): images → Boxes
    (stride coords of THAT scale) stacked over the batch."""
    model = _maybe_fused(model, cfg)

    @jax.jit
    def detect(params, images):
        images = normalize_images(images, cfg.data.mean, cfg.data.std)
        dets, _ = _detect_batch(model, cfg, params, images)
        return dets

    return detect


def build_ensemble_fn(models: list[KGNet], cfg: Config,
                      mask_member: int = 0) -> Callable:
    """Multi-checkpoint ensemble inference, optionally × multi-scale/flip
    TTA.  [extends SURVEY.md C16's cross-variant merge across *models*; the
    reference has no ensemble mode — round-5 quality experiment]

    Every (member, scale, flip) variant contributes detections in
    base-scale stride coords to ONE cross-variant merge (`merge_scales`,
    identical vote semantics to TTA: with `tta_vote="mean"` a detection's
    score is its mean best-match score over ALL variants, so cross-model
    agreement is rewarded exactly like cross-scale agreement, and
    single-model ghosts are punished).  The mask stage then runs once on
    `models[mask_member]`'s base-scale features — pick the best mask
    producer there.

    Returns fn(params_list, images_by_scale): params_list[i] belongs to
    models[i]; images_by_scale follows the build_multiscale_fn contract,
    shared by all members (sides must divide every member's
    required_divisor — `benchmarks/sweep_ensemble.py` rounds to the max).
    `cfg.model` must be the mask member's ModelConfig: the stage-2 crop
    geometry comes from cfg.model.roi_size/mask_size (same contract as
    build_infer_fn).
    """
    models = [_maybe_fused(m, cfg) for m in models]
    scales = cfg.infer.test_scales
    base = cfg.infer.input_size

    def _cfg_at(img_side: int) -> Config:
        # the grouper's size cap (max_box_size, base-canvas stride units)
        # must follow each scale's own stride grid: at scale 1.25 an object
        # spans 1.25x more stride px, so an unscaled cap silently shrinks
        # the intended headroom (1.5x -> 1.2x)
        import dataclasses
        if cfg.group.max_box_size <= 0 or img_side == base:
            return cfg
        return dataclasses.replace(
            cfg, group=dataclasses.replace(
                cfg.group,
                max_box_size=cfg.group.max_box_size * img_side / base))

    @jax.jit
    def infer_ens(params_list, images_by_scale: dict):
        some = next(iter(images_by_scale.values()))
        single = some.ndim == 3                  # single image, no batch axis
        if single:
            images_by_scale = {k: v[None] for k, v in images_by_scale.items()}

        all_dets = []                    # Boxes with a leading batch axis
        base_feat = None
        for sc in scales:
            img = normalize_images(images_by_scale[f"{sc:g}"],
                                   cfg.data.mean, cfg.data.std)
            cfg_sc = _cfg_at(img.shape[1])
            # map boxes from this scale's stride grid to base-scale stride grid
            factor = base / float(img.shape[1])
            for mi, member in enumerate(models):
                dets, feat = _detect_batch(member, cfg_sc, params_list[mi],
                                           img)
                if sc == 1.0 and mi == mask_member:
                    base_feat = feat
                all_dets.append(Boxes(boxes=dets.boxes * factor,
                                      scores=dets.scores, valid=dets.valid))
                if cfg.infer.test_flip:
                    # horizontal-flip TTA at this scale: detect on the
                    # mirrored batch, un-mirror the boxes (x' = W - x, swapped)
                    fdets, _ = _detect_batch(member, cfg_sc, params_list[mi],
                                             img[:, :, ::-1])
                    ws = img.shape[2] / cfg.data.stride
                    fb = fdets.boxes
                    unflipped = jnp.stack(
                        [ws - fb[..., 2], fb[..., 1], ws - fb[..., 0],
                         fb[..., 3]], axis=-1)
                    all_dets.append(Boxes(boxes=unflipped * factor,
                                          scores=fdets.scores,
                                          valid=fdets.valid))
        assert base_feat is not None, "test_scales must include 1.0"

        # cross-variant merge per image (pure op → vmapped over the batch)
        def merge_one(*flat):
            per = [Boxes(flat[3 * i], flat[3 * i + 1], flat[3 * i + 2])
                   for i in range(len(all_dets))]
            return merge_scales(per, cfg.group.nms_iou,
                                cfg.group.max_detections,
                                vote=cfg.infer.tta_vote,
                                vote_iou=cfg.infer.tta_vote_iou,
                                vote_thresh=cfg.infer.tta_vote_thresh)

        flat_args = [x for d_ in all_dets
                     for x in (d_.boxes, d_.scores, d_.valid)]
        merged = jax.vmap(merge_one)(*flat_args)
        # mean-vote merge deliberately keeps boxes whose voted score sits in
        # [tta_vote_thresh, score_thresh): the rescore gate must not undo
        # that — gate at the looser of the two acceptance thresholds
        gate = (min(cfg.group.score_thresh, cfg.infer.tta_vote_thresh)
                if cfg.infer.tta_vote == "mean" else None)
        out = _mask_batch(models[mask_member], cfg,
                          params_list[mask_member], base_feat, merged,
                          base, base, rescore_gate=gate)
        if single:
            out = jax.tree.map(lambda x: x[0], out)
        return out

    return infer_ens


def build_multiscale_fn(model: KGNet, cfg: Config) -> Callable:
    """Multi-scale (and flip) TTA, batched on device.  [SURVEY.md C16 / §3.3;
    BASELINE config 4 "batched on-device"]

    Returns fn(params, {scale: images_at_scale}) where each value is
    [B, side, side, 3] with side = round(scale * input_size) (B may be 1);
    per image, detections from every scale/flip variant are mapped to
    base-scale stride coords, merged with cross-variant NMS on device, and
    the mask stage runs once on base-scale features.

    Implemented as the one-member case of `build_ensemble_fn` (for one
    member the variant pool and merge are element-for-element what this
    function built standalone through round 4; the TTA quality gates in
    tests/test_e2e.py and the merge test in tests/test_infer.py pin it).
    """
    ens = build_ensemble_fn([model], cfg, mask_member=0)

    def infer_ms(params, images_by_scale: dict):
        return ens([params], images_by_scale)

    return infer_ms


def build_tiled_infer_fn(model: KGNet, cfg: Config,
                         image_hw: tuple[int, int], mesh=None,
                         tile_batch: int = 8) -> Callable:
    """Whole-slide inference: ONE jitted call per slide.  [BASELINE config 5]

    Static tile grid → detector over tiles, `tile_batch` at a time under a
    `lax.scan` (compile cost is constant in slide size — the fully-vmapped
    25-tile 2048² program blew past a 9-minute remote compile; the scanned
    form traces the per-chunk pipeline once) → per-tile ownership filter
    (cross-tile dedup without global NMS) → per-tile mask stage and local
    paste with globally-unique ids → on-device stitch.

    With `mesh`, the chunk's tile axis is sharding-constrained onto the
    "data" axis, so tiles fan out over chips — the spatial-DP layout of
    SURVEY.md §2.10 (pick tile_batch = a multiple of the mesh size).
    """
    if cfg.group.method == "centernet" and not cfg.model.use_wh_head:
        raise ValueError(
            'group.method="centernet" needs model.use_wh_head=True')
    model = _maybe_fused(model, cfg, mesh)
    h, w = image_hw
    ts, ov = cfg.infer.tile_size, cfg.infer.tile_overlap
    s = cfg.data.stride
    d = cfg.group.max_detections
    origins_np = tile_grid(h, w, ts, ov)
    rects_np = ownership_rects(origins_np, ts)
    n_tiles = len(origins_np)
    pad = (-n_tiles) % tile_batch
    # padding tiles reuse origin 0 and are masked out via a validity flag
    origins_pad = np.concatenate(
        [origins_np, np.zeros((pad, 2), np.int32)], axis=0)
    rects_pad = np.concatenate(
        [rects_np, np.zeros((pad, 4), np.float32)], axis=0)
    tile_ok_np = np.concatenate(
        [np.ones(n_tiles, bool), np.zeros(pad, bool)])
    n_chunks = (n_tiles + pad) // tile_batch

    def infer_tiled(params, image):
        image = normalize_images(image, cfg.data.mean, cfg.data.std)
        origins = jnp.asarray(origins_pad)
        rects = jnp.asarray(rects_pad)
        tile_ok = jnp.asarray(tile_ok_np)
        tile_ids = jnp.arange(n_tiles + pad, dtype=jnp.int32)

        def chunk_body(_, inp):
            org, rct, ok, tid = inp                 # [TB,2],[TB,4],[TB],[TB]
            tiles = extract_tiles(image, org, ts)   # [TB, ts, ts, 3]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                tiles = jax.lax.with_sharding_constraint(
                    tiles, NamedSharding(mesh, PartitionSpec("data")))
            out = model.apply(_vars(params), tiles)
            last = out["stacks"][-1]
            has_wh = "wh" in last

            def per_tile(hm, reg, wh, origin, rect, t_ok):
                if cfg.group.method == "centernet":
                    cand = decode_center_wh(
                        hm, reg, wh, cfg.group.max_detections,
                        cfg.group.score_thresh)
                else:
                    peaks = decode_peaks(hm, reg,
                                         cfg.group.max_peaks_per_class)
                    cand = group_keypoints(
                        peaks, cfg.group,
                        kp_wh=_peak_wh({"wh": wh} if has_wh else {},
                                       peaks, cfg, batch_idx=None))
                dets = box_nms(cand, cfg.group.nms_iou)
                dets_px = Boxes(boxes=dets.boxes * s, scores=dets.scores,
                                valid=dets.valid)
                own = ownership_mask(dets_px, origin, rect) & t_ok
                gboxes = dets_px.boxes + jnp.asarray(
                    [origin[1], origin[0], origin[1], origin[0]], jnp.float32)
                return dets.boxes, dets.scores, own, gboxes

            wh = last.get("wh", jnp.zeros_like(last["reg"]))
            boxes_st, scores_t, own_t, gboxes = jax.vmap(per_tile)(
                last["hm"], last["reg"], wh, org, rct, ok)
            # mask head + paste run at TILE-BATCH level (tiles = batch) so
            # detection-slot chunks with no OWNED detection in any tile of
            # the chunk skip entirely — the per-tile form computed all
            # TB·D slots densely (a per-tile cond under vmap is a select)
            tdets = Boxes(boxes=boxes_st, scores=scores_t, valid=own_t)
            probs = _mask_probs(model, cfg, params, out["feat"], tdets)
            scores_t, own_t = _rescore_by_maskness(cfg, probs, scores_t,
                                                   own_t)
            ch = cfg.infer.mask_chunk
            label, score = paste_masks_batch(
                probs, boxes_st * s, scores_t, own_t, ts, ts,
                thresh=cfg.group.mask_thresh,
                box_chunk=(ch if 0 < ch < d else 32),
                id_base=tid * d)
            return None, (label, score, gboxes, scores_t, own_t)

        xs = (origins.reshape(n_chunks, tile_batch, 2),
              rects.reshape(n_chunks, tile_batch, 4),
              tile_ok.reshape(n_chunks, tile_batch),
              tile_ids.reshape(n_chunks, tile_batch))
        _, (labels, scores_map, gboxes, gscores, gvalid) = jax.lax.scan(
            chunk_body, None, xs)

        flat = lambda a: a.reshape((-1,) + a.shape[2:])[:n_tiles]
        g_label, g_score = stitch_tiles(
            flat(labels), flat(scores_map), jnp.asarray(origins_np), h, w)
        return {
            "label_map": g_label, "score_map": g_score,
            "boxes": flat(gboxes).reshape(n_tiles * d, 4),
            "scores": flat(gscores).reshape(n_tiles * d),
            "valid": flat(gvalid).reshape(n_tiles * d),
        }

    return jax.jit(infer_tiled)
