"""Fixed-seed end-to-end learning gate (SURVEY.md §4): train a tiny model on
synthetic blobs, then assert AP floors for the single-scale, TTA, and tiled
inference paths.  Runs UN-marked in the default "not slow" suite so a
regression that silently breaks learning (loss scaling, target rendering,
grouper thresholds) fails the advertised gate — VERDICT.md round-1 item 3.

The model is trained ONCE per module (the expensive part is XLA compile, not
the 150 tiny steps); each path then evaluates the same weights.
"""

import dataclasses

import jax
import numpy as np
import pytest

from kgtpu import evaluate, train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import batch_iterator, build_dataset
from kgtpu.data.loader import _prepare_sample
from kgtpu.infer import build_infer_fn, build_multiscale_fn, build_tiled_infer_fn
from kgtpu.models import KGNet

SIZE = 96          # divisible by hourglass_lite's required 16
N_EVAL = 4


def _cfg():
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, input_size=SIZE, max_instances=12),
        train=dataclasses.replace(cfg.train, lr=2e-3, lr_warmup_steps=20),
        infer=dataclasses.replace(cfg.infer, input_size=SIZE),
    )


def _train(cfg):
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)
    ds = build_dataset(cfg.data)
    first = last = None
    for i, batch in enumerate(
            batch_iterator(ds, cfg.data, 2, steps=150, seed=0)):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < 0.6 * first, f"no learning: {first} -> {last}"
    val = build_dataset(cfg.data, split="val")
    return cfg, model, state, val


@pytest.fixture(scope="module")
def trained():
    return _train(_cfg())


def _eval_single(cfg, model, state, val):
    infer = build_infer_fn(model, cfg)
    nprng = np.random.default_rng(0)
    recs = []
    for i in range(N_EVAL):
        s = _prepare_sample(val[i], cfg.data, augment=False, rng=nprng)
        out = infer(state.params, s["image"][None])
        recs.append({"pred_label": np.asarray(out["label_map"][0]),
                     "scores": np.asarray(out["scores"][0]),
                     "gt_label": s["label_map"]})
    return recs


def test_single_scale_ap_floor(trained):
    cfg, model, state, val = trained
    recs = _eval_single(cfg, model, state, val)
    res = evaluate.evaluate_dsb2018(recs)
    # floors at ~70% of the measured tiny-model level (mAP 0.32 / AP50 0.84
    # at this seed, VERDICT r2 item 6) so a 2x quality regression fails; the
    # remaining margin absorbs seed noise
    assert res["mAP_dsb2018"] > 0.22, res
    coco = evaluate.evaluate_coco(recs)
    assert coco["AP50"] > 0.58, coco


def test_hard_scene_pipeline_recovery_floor():
    """Hard-benchmark gate on the POST-NETWORK pipeline (VERDICT r3 item 7):
    render ground-truth targets for synthetic_hard val scenes (elongated,
    clustered, occluded cells) and require decode→group→box-NMS to recover
    the instances.  Deterministic and training-free: a 150-step tiny model
    measures mAP 0.001 on this phenotype (600 steps: 0.057 — it needs the
    full flagship schedule), so a learned floor can't gate; the hard-scene
    regression risk lives in the grouper/NMS geometry handling (ghost pairs
    across touching elongated cells), which GT targets expose directly."""
    from kgtpu import ops
    from kgtpu.config import GroupConfig
    from tests.golden.oracles import box_iou

    import jax.numpy as jnp

    cfg = _cfg()
    # 192²: at the fixture's 96² the 24×24 stride-4 heatmap makes touching
    # elongated cells collapse onto shared corner pixels — a resolution
    # artifact, not the geometry this gate targets (measured: recall 0.77 at
    # 96² vs 0.92 at 192², precision 0.97 → 1.0)
    size = 192
    dcfg = dataclasses.replace(cfg.data, dataset="synthetic_hard",
                               input_size=size)
    val = build_dataset(dcfg, split="val")
    gcfg = GroupConfig(max_peaks_per_class=32, max_detections=32,
                       size_prune=1.2)
    nprng = np.random.default_rng(0)
    recalls, precisions = [], []
    for i in range(N_EVAL):
        s = _prepare_sample(val[i], dcfg, augment=False, rng=nprng)
        keep = np.asarray(s["valid"]).astype(bool)
        gt = np.asarray(s["boxes"], np.float32)[keep] / 4.0
        kpts = ops.keypoints_from_boxes(jnp.asarray(gt))
        sizes = jnp.stack([gt[:, 3] - gt[:, 1], gt[:, 2] - gt[:, 0]], -1)
        hm = ops.render_heatmaps(kpts, sizes, jnp.ones(len(gt)),
                                 size // 4, size // 4)
        peaks = ops.decode_peaks(hm, None, gcfg.max_peaks_per_class,
                                 apply_sigmoid=False)
        # GT size at each decoded corner: nearest GT corner's (w, h)
        kp_wh = np.zeros((5, gcfg.max_peaks_per_class, 2), np.float32)
        corners = np.asarray(ops.keypoints_from_boxes(jnp.asarray(gt)))
        wh_gt = np.stack([gt[:, 2] - gt[:, 0], gt[:, 3] - gt[:, 1]], -1)
        pc = np.asarray(peaks.coords)
        for c in range(5):
            d = np.linalg.norm(pc[c][:, None] - corners[:, c][None], axis=-1)
            kp_wh[c] = wh_gt[d.argmin(1)]
        dets = ops.box_nms(
            ops.group_keypoints(peaks, gcfg, kp_wh=jnp.asarray(kp_wh)),
            gcfg.nms_iou)
        vb = np.asarray(dets.boxes)[np.asarray(dets.valid)]
        iou = box_iou(vb, gt) if len(vb) else np.zeros((0, len(gt)))
        recalls.append((iou.max(0) >= 0.5).mean() if len(vb) else 0.0)
        precisions.append((iou.max(1) >= 0.5).mean() if len(vb) else 1.0)
    # measured at these seeds: recall [0.75, 1.0, 1.0, 0.92] mean 0.917
    # (misses = sub-2-stride occluded slivers), precision 1.000; floors
    # fail on ghost-pair (precision) or grouper/NMS (recall) regressions
    assert float(np.mean(recalls)) > 0.80, recalls
    assert float(np.mean(precisions)) > 0.85, precisions


def test_tta_at_least_single_scale(trained):
    cfg, model, state, val = trained
    # flip-only TTA (scales=(1.0,)) keeps compile cost bounded while still
    # exercising the cross-variant merge path end to end
    cfg_tta = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, test_flip=True))
    infer = build_multiscale_fn(model, cfg_tta)
    nprng = np.random.default_rng(0)
    recs = []
    n_tta = n_single = 0
    single_recs = _eval_single(cfg, model, state, val)
    for i in range(N_EVAL):
        s = _prepare_sample(val[i], cfg.data, augment=False, rng=nprng)
        out = infer(state.params, {"1": s["image"]})
        recs.append({"pred_label": np.asarray(out["label_map"]),
                     "scores": np.asarray(out["scores"]),
                     "gt_label": s["label_map"]})
        n_tta += int(np.asarray(out["valid"]).sum())
        n_single += int((single_recs[i]["pred_label"].max()))
    tta = evaluate.evaluate_coco(recs)
    single = evaluate.evaluate_coco(single_recs)
    assert tta["AP50"] > 0.3, tta
    # broken flip un-mirroring would place every flip detection at a mirrored
    # ghost position: NMS can't merge them, so the detection count ~doubles
    # (ratio -> 2.0) and AP collapses — both are asserted here
    assert n_tta <= 1.8 * max(n_single, 1), (n_tta, n_single)
    assert tta["AP_coco"] >= single["AP_coco"] - 0.04, (tta, single)
    # the round-2 TTA merge regression cost -0.03 DSB mAP (the FP-punishing
    # protocol — ghosts from unmatched variants) while COCO AP moved little;
    # gate DSB with a bound TIGHTER than that historical regression so the
    # same class of bug cannot pass again (VERDICT r3 item 7)
    tta_dsb = evaluate.evaluate_dsb2018(recs)["mAP_dsb2018"]
    single_dsb = evaluate.evaluate_dsb2018(single_recs)["mAP_dsb2018"]
    assert tta_dsb >= single_dsb - 0.02, (tta_dsb, single_dsb)


def test_cli_roundtrip_self_describing_checkpoint(trained, tmp_path):
    """VERDICT r2 items 5+6 end to end: (a) `test.py --weights <dir>` with
    ZERO architecture flags rebuilds the trained non-default model from the
    config stored in the checkpoint (without it, default flags build the full
    hourglass and the structure check exits); (b) the written
    <id>_label.png + <id>.json pairs re-read by eval.py reproduce the
    in-memory AP exactly — pinning the test.py↔eval.py slot-alignment
    contract."""
    import json
    import os
    import subprocess
    import sys

    from kgtpu import checkpoint, evaluate
    from kgtpu.data import build_dataset

    cfg, model, state, val = trained
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wdir = str(tmp_path / "weights")
    checkpoint.save(wdir, epoch=0, state=state,
                    extra={"config_json": checkpoint.encode_config(cfg)})

    out_dir = str(tmp_path / "results")
    env = {**os.environ, "KGTPU_PLATFORM": "cpu"}
    # group flags pinned to the tiny config so the CLI and the in-memory
    # reference run the identical program; NO architecture flags passed
    r = subprocess.run(
        [sys.executable, os.path.join(root, "test.py"),
         "--dataset", "synthetic", "--weights", wdir,
         "--input_size", str(SIZE), "--save_dir", out_dir,
         "--K", "32", "--max_detections", "32", "--batch_size", "4"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, os.path.join(root, "eval.py"),
         "--pred_dir", out_dir, "--dataset", "synthetic",
         "--protocol", "all"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    cli = json.loads(r.stdout.strip().splitlines()[-1])
    assert cli["num_images"] == 16
    # --protocol all carries every protocol family through the CLI
    for k in ("mAP_dsb2018", "AP_coco", "AJI", "PQ", "SQ", "RQ"):
        assert 0.0 <= cli[k] <= 1.0, (k, cli)

    # in-memory reference over the same test split
    infer = build_infer_fn(model, cfg)
    ds = build_dataset(cfg.data, split="test")
    nprng = np.random.default_rng(0)
    recs = []
    for i in range(len(ds)):
        s = _prepare_sample(ds[i], cfg.data, augment=False, rng=nprng)
        out = infer(state.params, s["image"][None])
        recs.append({"pred_label": np.asarray(out["label_map"][0]),
                     "scores": np.asarray(out["scores"][0]),
                     "gt_label": s["label_map"]})
    mem = evaluate.evaluate_coco(recs)
    assert abs(cli["AP_coco"] - mem["AP_coco"]) < 1e-6, (cli, mem)
    assert abs(cli["AP50"] - mem["AP50"]) < 1e-6, (cli, mem)


def test_cli_ensemble_duplicate_member(trained, tmp_path):
    """`test.py --ensemble` end to end: the CLI restores extra members from
    their self-describing checkpoints, merges through build_ensemble_fn,
    and writes the standard outputs.  With the primary duplicated as the
    only extra member the run must reproduce the in-memory ensemble of
    [model, model] exactly (test.py↔eval.py slot contract); by the
    duplicated-member no-op invariant (tests/test_ensemble.py) that is
    also the agreement-voted single-model result."""
    import json
    import os
    import subprocess
    import sys

    from kgtpu import checkpoint, evaluate
    from kgtpu.data import build_dataset
    from kgtpu.infer import build_ensemble_fn

    cfg, model, state, val = trained
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wdir = str(tmp_path / "weights")
    checkpoint.save(wdir, epoch=0, state=state,
                    extra={"config_json": checkpoint.encode_config(cfg)})

    out_dir = str(tmp_path / "results")
    env = {**os.environ, "KGTPU_PLATFORM": "cpu"}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "test.py"),
         "--dataset", "synthetic", "--weights", wdir, "--ensemble", wdir,
         "--input_size", str(SIZE), "--save_dir", out_dir,
         "--K", "32", "--max_detections", "32", "--batch_size", "4",
         "--tta_vote", "mean", "--tta_vote_thresh", "0.1"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    r = subprocess.run(
        [sys.executable, os.path.join(root, "eval.py"),
         "--pred_dir", out_dir, "--dataset", "synthetic",
         "--protocol", "coco"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    cli = json.loads(r.stdout.strip().splitlines()[-1])

    icfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, test_scales=(1.0,),
                                       tta_vote="mean",
                                       tta_vote_thresh=0.1))
    ens = build_ensemble_fn([model, model], icfg)
    ds = build_dataset(cfg.data, split="test")
    nprng = np.random.default_rng(0)
    recs = []
    for i in range(len(ds)):
        s = _prepare_sample(ds[i], cfg.data, augment=False, rng=nprng)
        out = ens([state.params, state.params], {"1": s["image"][None]})
        recs.append({"pred_label": np.asarray(out["label_map"][0]),
                     "scores": np.asarray(out["scores"][0]),
                     "gt_label": s["label_map"]})
    mem = evaluate.evaluate_coco(recs)
    assert abs(cli["AP_coco"] - mem["AP_coco"]) < 1e-6, (cli, mem)
    assert abs(cli["AP50"] - mem["AP50"]) < 1e-6, (cli, mem)


@pytest.fixture(scope="module")
def trained_crowded():
    """A second tiny model trained on the crowded variant — the
    ghost-suppression stress case (VERDICT r2 items 1/6: the round-2
    flagship claim had no e2e gate)."""
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="synthetic_crowded",
                                      max_instances=64))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)
    ds = build_dataset(cfg.data)
    first = last = None
    for i, batch in enumerate(
            batch_iterator(ds, cfg.data, 2, steps=200, seed=0)):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < 0.6 * first, f"no learning: {first} -> {last}"
    val = build_dataset(cfg.data, split="val")
    return cfg, model, state, val


def test_crowded_ap_floor_and_ghost_gate(trained_crowded):
    """Crowded-scene e2e: (a) AP floor holds with the wh-head size gate on
    (the default); (b) disabling the gate measurably collapses mAP — the
    data-free ghost suppression the grouper's size_prune exists for
    (measured at this seed: gated 0.21 vs ungated 0.10)."""
    cfg, model, state, val = trained_crowded
    gated = evaluate.evaluate_dsb2018(_eval_single(cfg, model, state, val))
    assert gated["mAP_dsb2018"] > 0.12, gated
    cfg_off = dataclasses.replace(
        cfg, group=dataclasses.replace(cfg.group, size_prune=0.0))
    ungated = evaluate.evaluate_dsb2018(
        _eval_single(cfg_off, model, state, val))
    assert gated["mAP_dsb2018"] > ungated["mAP_dsb2018"] + 0.03, (
        gated, ungated)


def test_tiled_ap_floor(trained):
    cfg, model, state, val = trained
    cfg_t = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tile_size=64,
                                       tile_overlap=16))
    tiled = build_tiled_infer_fn(model, cfg_t, (SIZE, SIZE), tile_batch=4)
    d = cfg.group.max_detections
    nprng = np.random.default_rng(0)
    recs = []
    for i in range(2):
        s = _prepare_sample(val[i], cfg.data, augment=False, rng=nprng)
        out = tiled(state.params, s["image"])
        lab = np.asarray(out["label_map"])
        scores_full = np.asarray(out["scores"])
        ids = np.unique(lab)
        ids = ids[ids > 0].astype(np.int32)
        relab = np.zeros_like(lab)
        for k, oid in enumerate(ids):
            relab[lab == oid] = k + 1
        recs.append({"pred_label": relab,
                     "scores": scores_full[ids - 1],
                     "gt_label": s["label_map"]})
    coco = evaluate.evaluate_coco(recs)
    assert coco["AP50"] > 0.25, coco
