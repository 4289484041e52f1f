"""Configuration for the kgtpu framework.  [SURVEY.md C1]

A single frozen dataclass tree replaces the reference's per-script argparse
(SURVEY.md §5 "Config / flag system").  An argparse shim exposes
reference-style flag names (``--data_dir``, ``--batch_size``, ``--resume``,
``--test_scales`` …) so users of the reference find the same surface.

Every semantic choice left OPEN by SURVEY.md §8 is a field here, with the
designated default, so a later parity pass is a config change, not a rewrite:

  OPEN-1  keypoint classes .... 5 = four box corners (TL,TR,BL,BR) + center
  OPEN-2  wh/size head ........ ON by default (`use_wh_head`): feeds the
                                grouper's size-consistency pruning and the
                                centernet decode; supervised at all 5 kp pixels
  OPEN-3  mask-head input ..... backbone features (ROI-cropped), joint training
  OPEN-5  AP protocol ......... DSB2018 mean-AP over IoU .5:.05:.95 (+COCO opt)
  OPEN-7  output stride ....... 4
  OPEN-9  grouping thresholds . all fields of `GroupConfig`
  OPEN-10 resize convention ... half-pixel centers (cv2 / TF crop_and_resize)
"""

from __future__ import annotations

import argparse
import dataclasses

# Keypoint class indices (OPEN-1 resolution; fixed across the whole framework).
KP_TL, KP_TR, KP_BL, KP_BR, KP_CENTER = 0, 1, 2, 3, 4
NUM_KP_CLASSES = 5


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone + heads.  [SURVEY.md C5-C7]"""

    backbone: str = "hourglass"        # "hourglass" | "hourglass_lite" |
                                       # "hourglass_fast" | "resnet_fpn" |
                                       # "unet".  _lite is the same
                                       # architecture (naming convention for
                                       # runs pairing it with smaller
                                       # width/depth, e.g. tiny_test_config);
                                       # _fast uses identity skips at the
                                       # full-res level (see hourglass.py)
    num_stacks: int = 2                # stacked-hourglass depth (1 for lite)
    base_channels: int = 128           # stem width (hourglass: feature width)
    hg_depth: int = 4                  # downsampling levels inside one hourglass
    head_channels: int = 128           # hidden width of the prediction heads
    num_kp_classes: int = NUM_KP_CLASSES
    use_wh_head: bool = True           # OPEN-2: regress box w/h in addition to
                                       # offsets.  On by default: the grouper's
                                       # size-consistency pruning reads it
                                       # (GroupConfig.size_prune) and the
                                       # centernet decode needs it
    norm: str = "group"                # "group" | "batch"; group avoids sync-BN in DP
    inter_inject: bool = False         # CornerNet-style prediction feedback:
                                       # re-inject each stack's head logits
                                       # into the next stack's input (needs
                                       # num_stacks > 1; ablation flag)
    # Mask head (stage 2).  OPEN-3: consumes ROI-cropped backbone features.
    roi_size: int = 32                 # crop size on the stride-4 feature map
    mask_size: int = 64                # mask-logit resolution (roi_size * 2 upsample)
    mask_channels: int = 64            # mask-head conv width
    # Numerics
    compute_dtype: str = "bfloat16"    # MXU-friendly; params stay float32
    param_dtype: str = "float32"
    remat: bool = False                # jax.checkpoint each hourglass stack:
                                       # trades recompute for activation HBM
                                       # (larger train batches per chip)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Datasets, augmentation, fixed-shape batching.  [SURVEY.md C2-C3]"""

    dataset: str = "synthetic"         # "synthetic" | "dsb2018" | "neural_cells"
    data_dir: str = ""
    synthetic_train_images: int = 64   # generated train-set size (synthetic*)
    input_size: int = 512              # square training crop (H = W)
    stride: int = 4                    # OPEN-7: output stride of the backbone
    max_instances: int = 128           # pad/truncate GT instances per image
    # Augmentation (host side, cv2/NumPy; affine-consistent across img/masks/kpts)
    flip_prob: float = 0.5
    scale_range: tuple[float, float] = (0.8, 1.2)
    rotate_deg: float = 0.0
    color_jitter: float = 0.2
    elastic_alpha: float = 0.0         # elastic deformation (Simard 2003):
                                       # max displacement px (0 = off)
    elastic_sigma: float = 32.0        # smoothness: noise-grid spacing px
    # Normalization (ImageNet-style means, as in CenterNet-family references)
    mean: tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class GroupConfig:
    """Keypoint-graph grouping + NMS knobs.  [SURVEY.md C10-C11; OPEN-9]

    The grouper forms candidate boxes from all (TL, BR) peak pairs, then
    scores each candidate by geometric consistency with the center / TR / BL
    keypoint graphs.  All thresholds live here so parity tuning is config-only.
    """

    method: str = "kg"                 # "kg" (keypoint graph) | "centernet"
                                       #   (center + wh head, needs use_wh_head)
    max_peaks_per_class: int = 128     # K: per-class top-k kept by the decoder
    max_detections: int = 128          # D: boxes kept after grouping + NMS
    kp_score_thresh: float = 0.1       # min peak score to participate in a pair
    center_thresh: float = 0.1         # min center-peak score to support a box
    center_tol: float = 0.35           # center must lie within tol * box diagonal
    edge_tol: float = 0.35             # TR/BL support tolerance, * box diagonal
    min_box_size: float = 2.0          # min width/height in stride-4 pixels
    max_box_size: float = 1e9          # optional hard cap on width/height
                                       #   (stride px); superseded by
                                       #   size_prune, kept as a manual knob
    size_prune: float = 3.0            # kill (TL, BR) pairs whose span exceeds
                                       #   size_prune x the wh-head-predicted
                                       #   size AT THE CORNER PEAKS.  This is
                                       #   what stops cross-cell ghost pairs in
                                       #   crowded scenes (whose midpoint hits
                                       #   SOME center) without any dataset
                                       #   statistics prior.  0 disables; needs
                                       #   model.use_wh_head
    require_center: bool = True        # a box with no center support is dropped
    require_edges: bool = False        # also require TR and BL support > 0
    w_corner: float = 1.0              # score weights: corner pair mean,
    w_center: float = 1.0              #   center support score,
    w_edge: float = 0.5                #   TR/BL support score mean
    score_thresh: float = 0.15         # final min box score
    nms_iou: float = 0.5               # box-NMS IoU threshold
    mask_thresh: float = 0.5           # mask binarization threshold (C13)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization + checkpointing.  [SURVEY.md C14, C18]"""

    batch_size: int = 8
    lr: float = 2.5e-4
    lr_schedule: str = "constant"      # "constant" | "cosine" (decays to
                                       # lr/100 over num_epochs*steps_per_epoch)
    lr_warmup_steps: int = 500
    num_epochs: int = 100
    steps_per_epoch: int = 0           # 0 = derive from dataset length
    weight_decay: float = 0.0
    grad_clip_norm: float = 5.0
    ema_decay: float = 0.0             # 0 disables EMA params
    seed: int = 0
    # loss weights (C8): focal on heatmaps, L1 on offsets, BCE+dice on masks
    w_heatmap: float = 1.0
    w_offset: float = 1.0
    w_wh: float = 0.1
    w_mask: float = 1.0
    # gaussian target renderer: "scan" = XLA instance-chunk scan (default),
    # "pallas" = row-tiled TPU kernel that skips out-of-reach instances
    # (ops/pallas/gaussian.py; parity-tested; forced back to "scan" under a
    # mesh — pallas_call has no SPMD partitioning rule)
    target_renderer: str = "scan"
    mask_train_rois: int = 16   # instances per image fed to the mask head
    roi_jitter: float = 0.1     # train-time box jitter, fraction of box size
    focal_alpha: float = 2.0           # CornerNet penalty-reduced focal exponents
    focal_beta: float = 4.0
    # checkpoint semantics mirror the reference: epoch-numbered files + --resume
    save_dir: str = "weights"
    save_every_epochs: int = 1
    keep_last: int = 0                 # retention: keep only the N newest
                                       # model_<epoch> dirs (+ the best.json
                                       # epoch); 0 = keep all
    eval_every_epochs: int = 0         # run held-out AP every N epochs
                                       # during training (0 = off); results
                                       # land in metrics.jsonl + the log
    resume: str = ""                   # path or "" (fresh start)
    init_from: str = ""                # fine-tuning: load ONLY params from
                                       # this checkpoint (fresh optimizer,
                                       # epoch 0) — unlike --resume
    # host-RSS watchdog (SURVEY §5 failure recovery): past this many GB the
    # run checkpoints and re-execs itself with --resume at the next epoch
    # boundary (the remote-TPU tunnel client leaks host memory per dispatch;
    # see kgtpu/utils/host.py). -1 = auto (75% of MemTotal), 0 = off.
    rss_limit_gb: float = -1.0
    # data-parallel mesh (SURVEY §2.10): number of chips on the "data" axis;
    # 0 = use all visible devices
    num_devices: int = 0
    # optimization steps scanned inside one jitted dispatch (lax.scan over k
    # device-resident batches).  Identical update sequence to k single-step
    # dispatches; amortizes per-dispatch host latency (the dev tunnel's
    # ~24 ms floor) k-fold.  1 = one dispatch per step (reference-like).
    steps_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class InferConfig:
    """Inference / TTA / tiling.  [SURVEY.md C15-C16, config 5]"""

    weights: str = ""                  # checkpoint to load
    test_scales: tuple[float, ...] = (1.0,)   # multi-scale TTA scales
    test_flip: bool = False            # add horizontal-flip TTA (merged on
                                       # device like the extra scales)
    tta_vote: str = "mean"             # cross-variant merge scoring:
                                       #   "max"  = classic NMS merge (keeps
                                       #            every variant's ghosts)
                                       #   "mean" = rescore by cross-variant
                                       #            agreement (ops.nms
                                       #            merge_scales docstring)
    tta_vote_iou: float = 0.5          # IoU for a variant box to support a
                                       # merged box
    tta_vote_thresh: float = 0.15      # drop merged boxes whose voted score
                                       # falls below this (0 keeps all).
                                       # 0.15 is the swept point where TTA
                                       # beats single-scale on BOTH the
                                       # DSB2018 mAP and COCO AP protocols
                                       # on both benchmark sets (README)
    input_size: int = 512              # inference canvas (pad/resize to square)
    mask_chunk: int = 32               # mask-stage detection-slot chunk: the
                                       # ROI crop + mask head run as a scan
                                       # over D/mask_chunk chunks, skipping
                                       # (lax.cond) chunks with no valid
                                       # detection.  box_nms compacts kept
                                       # rows first, so with ~6-25 dets/img
                                       # only the first chunk computes —
                                       # the roofline's largest inference
                                       # stage shrinks ~D/dets-fold.  0 =
                                       # dense (all D slots every call);
                                       # valid-slot outputs are identical
    mask_rescore: float = 0.0          # w>0: multiply each detection score
                                       # by maskness^w (mean mask prob over
                                       # the mask head's own foreground) —
                                       # SOLO/Mask-Scoring-style stage-2
                                       # confidence rescoring; 0 = off
    fused_norm: str = "off"            # "auto": swap flax GroupNorm for the
                                       # Pallas fused GN(+ReLU) kernel on
                                       # the single-chip TPU inference path
                                       # (identical params; ops/pallas/
                                       # groupnorm.py).  Default OFF: the
                                       # kernel measured a consistent -17%
                                       # e2e (525 vs 634 img/s, 2x2 A/B on
                                       # the v5e) — the opaque Pallas call
                                       # breaks XLA's conv/norm fusion and
                                       # costs more than the saved HBM pass
                                       # (documented negative result, see
                                       # ops/pallas/groupnorm.py)
    batch_size: int = 1
    # whole-slide sliding-window tiling (BASELINE config 5)
    tile_size: int = 512
    tile_overlap: int = 64
    save_dir: str = "results"


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    group: GroupConfig = dataclasses.field(default_factory=GroupConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    infer: InferConfig = dataclasses.field(default_factory=InferConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)


def tiny_test_config() -> Config:
    """Small config used across unit tests: fast to compile on CPU."""
    return Config(
        model=ModelConfig(
            backbone="hourglass_lite", num_stacks=1, base_channels=32,
            hg_depth=2, head_channels=32, roi_size=8, mask_size=16,
            mask_channels=16, compute_dtype="float32",
        ),
        data=DataConfig(input_size=128, max_instances=16),
        group=GroupConfig(max_peaks_per_class=32, max_detections=32),
        train=TrainConfig(batch_size=2, num_epochs=1, steps_per_epoch=2,
                          mask_train_rois=4),
        infer=InferConfig(input_size=128),
    )


# ---------------------------------------------------------------------------
# Config <-> JSON (self-describing checkpoints, VERDICT r2 item 5)
# ---------------------------------------------------------------------------

def config_to_json(cfg: Config) -> str:
    """Serialize the full config tree (stored inside every checkpoint so
    `test.py --weights <dir>` can rebuild the exact trained architecture
    with zero flags; the reference's `test.py` needs only a weights file
    because its architecture lives in code — here it lives in config)."""
    import json

    return json.dumps(dataclasses.asdict(cfg), sort_keys=True)


def config_from_json(s: str) -> Config:
    """Inverse of `config_to_json`.  Unknown keys (from a future version)
    are ignored; missing keys keep current defaults; list-typed JSON values
    are coerced back to the tuples the dataclasses declare."""
    import json

    raw = json.loads(s)

    def build(dc_type, d: dict):
        kwargs = {}
        for f in dataclasses.fields(dc_type):
            if f.name not in d:
                continue
            v = d[f.name]
            kwargs[f.name] = tuple(v) if isinstance(v, list) else v
        return dc_type(**kwargs)

    return Config(
        model=build(ModelConfig, raw.get("model", {})),
        data=build(DataConfig, raw.get("data", {})),
        group=build(GroupConfig, raw.get("group", {})),
        train=build(TrainConfig, raw.get("train", {})),
        infer=build(InferConfig, raw.get("infer", {})),
    )


def apply_model_overrides(model: ModelConfig, a: argparse.Namespace,
                          explicit: set[str]) -> ModelConfig:
    """Override a checkpoint-stored ModelConfig with the architecture flags
    the user explicitly passed (everything not passed keeps the trained
    value — the reference-parity "point at weights, get the model" rule)."""
    kw = {}
    if "backbone" in explicit:
        kw["backbone"] = a.backbone
    if "num_stacks" in explicit:
        kw["num_stacks"] = a.num_stacks
    if "norm" in explicit:
        kw["norm"] = a.norm
    if "wh_head" in explicit:
        kw["use_wh_head"] = bool(a.wh_head) or a.decode == "centernet"
    elif "decode" in explicit and a.decode == "centernet":
        # centernet decode NEEDS the wh head; but an explicit `--decode kg`
        # (restating the default) must NOT force the parser-default
        # wh_head=1 onto a checkpoint trained without one
        kw["use_wh_head"] = True
    if "inter_inject" in explicit:
        kw["inter_inject"] = a.inter_inject
    if "roi_size" in explicit:
        kw["roi_size"] = a.roi_size
        kw["mask_size"] = a.mask_size or 2 * a.roi_size
    if "mask_size" in explicit and a.mask_size:
        kw["mask_size"] = a.mask_size
    return dataclasses.replace(model, **kw)


def explicit_cli_dests(parser: argparse.ArgumentParser,
                       argv: list[str] | None = None) -> set[str]:
    """Which argparse dests the user explicitly passed on the command line
    (vs. received as defaults) — the merge rule for self-describing
    checkpoints is "checkpoint config is the base, explicit flags override"."""
    import copy

    probe = copy.deepcopy(parser)
    for a in probe._actions:
        a.default = argparse.SUPPRESS
    ns, _ = probe.parse_known_args(argv)
    return set(vars(ns))


# ---------------------------------------------------------------------------
# argparse shim — reference-style flags (SURVEY.md C1, OPEN-8 defaults)
# ---------------------------------------------------------------------------

def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataset", default="dsb2018",
                   choices=["synthetic", "synthetic_crowded",
                            "synthetic_hard", "dsb2018", "neural_cells",
                            "coco", "folder"])
    p.add_argument("--data_dir", default="")
    p.add_argument("--input_size", type=int, default=512)
    p.add_argument("--backbone", default="hourglass",
                   choices=["hourglass", "hourglass_lite", "hourglass_fast",
                            "resnet_fpn", "unet"])
    p.add_argument("--num_stacks", type=int, default=2)
    p.add_argument("--norm", default="group", choices=["group", "batch"],
                   help="backbone normalization (batch = reference-style BN)")
    p.add_argument("--decode", default="kg", choices=["kg", "centernet"],
                   help="box assembly: keypoint-graph (reference) or "
                        "center+wh (enables the size head)")
    p.add_argument("--K", dest="max_peaks", type=int, default=128,
                   help="per-class top-k peaks kept by the decoder")
    p.add_argument("--max_detections", type=int, default=128)
    p.add_argument("--conf_thresh", type=float, default=0.15)
    p.add_argument("--nms_iou", type=float, default=0.5)
    p.add_argument("--max_box_size", type=float, default=0.0,
                   help="optional hard cap on box side in INPUT pixels "
                        "(0 = unlimited); usually unnecessary — crowded-scene "
                        "ghost pairs are pruned by --size_prune instead")
    p.add_argument("--size_prune", type=float, default=3.0,
                   help="kill (TL,BR) pairs spanning more than this multiple "
                        "of the wh-head-predicted size at the corner peaks "
                        "(0 disables; replaces the old dataset size prior)")
    p.add_argument("--wh_head", type=int, default=1, choices=[0, 1],
                   help="train/use the (w,h) size head (needed by "
                        "--size_prune and --decode centernet)")
    p.add_argument("--inter_inject", action="store_true",
                   help="CornerNet-style prediction feedback between "
                        "hourglass stacks (train and test must both set it)")
    p.add_argument("--roi_size", type=int, default=32,
                   help="mask-head ROI crop side on the stride-4 features "
                        "(train and test must match; OPEN-3 ablation knob)")
    p.add_argument("--synthetic_n", type=int, default=64,
                   help="generated train-set size for the synthetic datasets")
    p.add_argument("--mask_size", type=int, default=0,
                   help="mask-logit resolution (0 = 2x --roi_size)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (report the op producing "
                        "NaN/Inf; slower)")


def build_train_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train.py", description="Train the KG model (TPU)")
    _add_common(p)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--aug_scale", default="0.8,1.2",
                   help="random scale-jitter range LO,HI for the joint "
                        "affine augmentation (image/masks/keypoints)")
    p.add_argument("--aug_elastic", default="0",
                   help="elastic deformation: ALPHA (max displacement px) "
                        "or ALPHA,SIGMA (smoothness grid px); 0 = off. "
                        "Measured NET-NEGATIVE on the synthetic benchmark "
                        "family at every swept setting — (12,32) -0.105 "
                        "mAP, (6,48) -0.041, (12,64) -0.055, (20,96) "
                        "-0.054 vs off (README round-5 sweep); intended "
                        "for real stained-tissue data only")
    p.add_argument("--aug_rotate", type=float, default=0.0,
                   help="random rotation range in +/- degrees for the "
                        "joint affine augmentation")
    p.add_argument("--ema_decay", type=float, default=0.0)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize hourglass activations (less HBM "
                        "capacity, more FLOPs -> bigger batches). Measured "
                        "round 5: -4.7..-8%% img/s at batches 8-32 where "
                        "nothing is capacity-bound (BASELINE.md) — use only "
                        "when batch/model size is memory-limited")
    p.add_argument("--lr", type=float, default=2.5e-4)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--save_dir", default="weights")
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every N epochs (the final epoch always "
                        "saves)")
    p.add_argument("--keep_last", type=int, default=0,
                   help="keep only the N newest checkpoints (+ the best-val "
                        "epoch); 0 = keep all")
    p.add_argument("--eval_every", type=int, default=0,
                   help="evaluate held-out AP every N epochs during "
                        "training (0 = off); rows land in metrics.jsonl")
    p.add_argument("--resume", default="", nargs="?", const="latest",
                   help="checkpoint path, or bare flag to resume the latest")
    p.add_argument("--init_from", default="",
                   help="fine-tune: initialize ONLY the network weights "
                        "from this checkpoint (fresh optimizer, epoch 0)")
    p.add_argument("--rss_limit_gb", type=float, default=-1.0,
                   help="host-RSS watchdog: checkpoint + self-restart past "
                        "this many GB (-1 = auto 75%% of RAM, 0 = off)")
    p.add_argument("--ngpus", "--num_devices", dest="num_devices", type=int,
                   default=0, help="devices on the data axis (0 = all visible)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train steps scanned inside one jitted dispatch "
                        "(same update sequence; amortizes per-dispatch host "
                        "latency — use 8-32 on high-RTT links)")
    p.add_argument("--target_renderer", default="scan",
                   choices=["scan", "pallas"],
                   help="gaussian heatmap-target renderer inside the train "
                        "step: XLA scan (default) or the row-tiled Pallas "
                        "kernel (single-chip only; forced to scan under a "
                        "mesh). Measured round 5: pallas ties scan at "
                        "--steps_per_dispatch 8 and loses 14%% at k=1 "
                        "(BASELINE.md) — kept for re-measurement elsewhere")
    # multi-host (multi-controller) data parallelism: run the same command
    # on every host with a shared --coordinator and distinct --host_id
    p.add_argument("--coordinator", default="",
                   help="host:port of host 0 — enables multi-host DP via "
                        "jax.distributed (batch_size stays GLOBAL)")
    p.add_argument("--num_hosts", type=int, default=1)
    p.add_argument("--host_id", type=int, default=0)
    p.add_argument("--profile_dir", default="",
                   help="if set, jax.profiler traces train steps here")
    return p


def build_test_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("test.py", description="Run KG inference (TPU)")
    _add_common(p)
    p.add_argument("--weights", default="", help="checkpoint file/dir to load")
    p.add_argument("--ensemble", default="",
                   help="comma-separated EXTRA self-describing checkpoint "
                        "dirs whose detections are merged with --weights "
                        "via the TTA agreement vote (cross-model agreement "
                        "is scored like cross-scale agreement; the "
                        "--weights model runs the mask stage). Composes "
                        "with --test_scales/--test_flip; exclusive with "
                        "--tiled and --ngpus")
    p.add_argument("--use_ema", action="store_true",
                   help="load EMA params from the checkpoint when present "
                        "(applies to --ensemble members too)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="inference batch (single-scale path)")
    p.add_argument("--save_vis", action="store_true",
                   help="also write <id>_vis.png overlays (boxes + masks)")
    p.add_argument("--tiled", action="store_true",
                   help="whole-slide mode: treat --input_size as the slide "
                        "side and run sliding-window tiles of --tile_size "
                        "with --tile_overlap, stitched on device")
    p.add_argument("--test_scales", default="1.0",
                   help="comma-separated TTA scales, e.g. 0.75,1.0,1.25")
    p.add_argument("--test_flip", action="store_true",
                   help="add horizontal-flip TTA (merged on device)")
    p.add_argument("--tta_vote", default="mean", choices=["max", "mean"],
                   help="TTA merge scoring: mean = rescore by cross-variant "
                        "agreement (kills per-variant ghosts), max = classic "
                        "NMS merge")
    p.add_argument("--mask_chunk", type=int, default=32,
                   help="mask-stage detection-slot chunk size; chunks with "
                        "no valid detection are skipped on device (0 = "
                        "dense all-slots apply)")
    p.add_argument("--tta_vote_thresh", type=float, default=0.15,
                   help="drop TTA-merged boxes whose agreement-voted score "
                        "is below this (only with --tta_vote mean)")
    p.add_argument("--mask_rescore", type=float, default=0.0,
                   help="w>0 multiplies each detection score by maskness^w "
                        "(mean mask prob over the mask head's foreground)")
    p.add_argument("--fused_norm", default="off", choices=["auto", "off"],
                   help="auto = use the Pallas fused GroupNorm kernel for "
                        "single-chip TPU inference (same checkpoint params; "
                        "measured SLOWER e2e than XLA's own fusion — "
                        "default off, see ops/pallas/groupnorm.py)")
    p.add_argument("--save_dir", default="results")
    p.add_argument("--coco_json", default="",
                   help="also write predictions as COCO results JSON "
                        "(bbox + uncompressed-RLE segmentation per instance)")
    p.add_argument("--ngpus", "--num_devices", dest="num_devices", type=int,
                   default=0, help="batch-DP inference devices (0 = single; "
                                   "single-scale and --tiled paths)")
    p.add_argument("--tile_size", type=int, default=512)
    p.add_argument("--tile_overlap", type=int, default=64)
    p.add_argument("--profile_dir", default="")
    return p


def build_eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("eval.py", description="Evaluate mask AP")
    p.add_argument("--pred_dir", default="results")
    p.add_argument("--gt_dir", default="")
    p.add_argument("--dataset", default="dsb2018")
    p.add_argument("--protocol", default="dsb2018",
                   choices=["dsb2018", "coco", "aji", "pq", "all"])
    return p


def config_from_train_args(a: argparse.Namespace) -> Config:
    c = Config()
    try:
        lo, hi = (float(x) for x in str(a.aug_scale).split(","))
    except ValueError:
        raise SystemExit(f"--aug_scale {a.aug_scale!r} must be LO,HI")
    if not (0.0 < lo <= hi):
        raise SystemExit(f"--aug_scale {a.aug_scale!r} needs 0 < LO <= HI")
    try:
        el = [float(x) for x in str(a.aug_elastic).split(",")]
        e_alpha, e_sigma = (el + [c.data.elastic_sigma])[:2]
    except ValueError:
        raise SystemExit(
            f"--aug_elastic {a.aug_elastic!r} must be ALPHA or ALPHA,SIGMA")
    if e_alpha < 0 or e_sigma <= 0:
        raise SystemExit(
            f"--aug_elastic {a.aug_elastic!r} needs ALPHA >= 0, SIGMA > 0")
    return Config(
        model=dataclasses.replace(c.model, backbone=a.backbone,
                                  num_stacks=a.num_stacks, norm=a.norm,
                                  use_wh_head=(bool(a.wh_head)
                                               or a.decode == "centernet"),
                                  inter_inject=a.inter_inject,
                                  roi_size=a.roi_size,
                                  mask_size=a.mask_size or 2 * a.roi_size,
                                  remat=a.remat),
        data=dataclasses.replace(c.data, dataset=a.dataset, data_dir=a.data_dir,
                                 input_size=a.input_size,
                                 synthetic_train_images=a.synthetic_n,
                                 scale_range=(lo, hi),
                                 rotate_deg=a.aug_rotate,
                                 elastic_alpha=e_alpha,
                                 elastic_sigma=e_sigma),
        group=dataclasses.replace(c.group, method=a.decode,
                                  max_peaks_per_class=a.max_peaks,
                                  max_detections=a.max_detections,
                                  max_box_size=(a.max_box_size / c.data.stride
                                                if a.max_box_size > 0 else 1e9),
                                  size_prune=a.size_prune,
                                  score_thresh=a.conf_thresh, nms_iou=a.nms_iou),
        train=dataclasses.replace(c.train, batch_size=a.batch_size, lr=a.lr,
                                  lr_schedule=a.lr_schedule,
                                  num_epochs=a.num_epochs,
                                  steps_per_epoch=a.steps_per_epoch,
                                  save_dir=a.save_dir, resume=a.resume,
                                  init_from=a.init_from,
                                  save_every_epochs=max(a.save_every, 1),
                                  keep_last=max(a.keep_last, 0),
                                  eval_every_epochs=max(a.eval_every, 0),
                                  num_devices=a.num_devices, seed=a.seed,
                                  ema_decay=a.ema_decay,
                                  rss_limit_gb=a.rss_limit_gb,
                                  steps_per_dispatch=max(
                                      a.steps_per_dispatch, 1),
                                  target_renderer=a.target_renderer),
        infer=c.infer,
    )


def config_from_test_args(a: argparse.Namespace) -> Config:
    c = Config()
    scales = tuple(float(s) for s in str(a.test_scales).split(",") if s)
    if not scales:
        raise SystemExit("--test_scales must list at least one scale")
    if 1.0 not in scales:
        # the TTA merge runs the mask stage on base-scale (1.0) features and
        # test.py indexes the 1.0 image stack; without this check the
        # failure surfaces as an opaque trace-time error (or, under
        # python -O, a KeyError) deep inside build_multiscale_fn
        raise SystemExit(
            f"--test_scales {a.test_scales!r} must include 1.0 (the base "
            "scale that the mask stage and the TTA merge are anchored to)")
    return Config(
        model=dataclasses.replace(c.model, backbone=a.backbone,
                                  num_stacks=a.num_stacks, norm=a.norm,
                                  use_wh_head=(bool(a.wh_head)
                                               or a.decode == "centernet"),
                                  inter_inject=a.inter_inject,
                                  roi_size=a.roi_size,
                                  mask_size=a.mask_size or 2 * a.roi_size),
        data=dataclasses.replace(c.data, dataset=a.dataset, data_dir=a.data_dir,
                                 input_size=a.input_size,
                                 synthetic_train_images=a.synthetic_n),
        group=dataclasses.replace(c.group, method=a.decode,
                                  max_peaks_per_class=a.max_peaks,
                                  max_detections=a.max_detections,
                                  max_box_size=(a.max_box_size / c.data.stride
                                                if a.max_box_size > 0 else 1e9),
                                  size_prune=a.size_prune,
                                  score_thresh=a.conf_thresh, nms_iou=a.nms_iou),
        train=c.train,
        infer=dataclasses.replace(c.infer, weights=a.weights, test_scales=scales,
                                  test_flip=a.test_flip,
                                  mask_chunk=a.mask_chunk,
                                  mask_rescore=a.mask_rescore,
                                  fused_norm=a.fused_norm,
                                  tta_vote=a.tta_vote,
                                  tta_vote_thresh=a.tta_vote_thresh,
                                  input_size=a.input_size, save_dir=a.save_dir,
                                  tile_size=a.tile_size,
                                  tile_overlap=a.tile_overlap,
                                  batch_size=a.batch_size),
    )
