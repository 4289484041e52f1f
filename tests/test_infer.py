"""Inference pipeline tests (C15-C16): single program, shapes, TTA merge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.infer import build_infer_fn, build_multiscale_fn
from kgtpu.models import KGNet


def _setup():
    cfg = tiny_test_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    return cfg, model, state.params


def test_infer_shapes_and_jit():
    cfg, model, params = _setup()
    infer = build_infer_fn(model, cfg)
    imgs = jnp.zeros((2, 128, 128, 3))
    out = infer(params, imgs)
    d = cfg.group.max_detections
    m = cfg.model.mask_size
    assert out["boxes"].shape == (2, d, 4)
    assert out["scores"].shape == (2, d)
    assert out["valid"].shape == (2, d)
    assert out["masks"].shape == (2, d, m, m)
    assert out["label_map"].shape == (2, 128, 128)
    assert out["label_map"].dtype == jnp.int32


def test_infer_sharded_matches_unsharded():
    """Batch-DP inference (build_infer_fn(mesh=...)) over the 8-device CPU
    mesh must reproduce single-device outputs exactly — SURVEY.md §2.10's
    serving analogue of the sharded train step."""
    from kgtpu.parallel import make_mesh

    cfg, model, params = _setup()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(8, 128, 128, 3),
                                    dtype=np.uint8))
    single = build_infer_fn(model, cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = build_infer_fn(model, cfg, mesh=mesh)
    a = single(params, imgs)
    b = sharded(params, imgs)
    np.testing.assert_array_equal(np.asarray(a["label_map"]),
                                  np.asarray(b["label_map"]))
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["valid"]),
                                  np.asarray(b["valid"]))


def test_infer_untrained_mostly_empty():
    """Untrained net (hm prior ~0.1 < score_thresh with decay) → few/no dets;
    label map ids must stay within [0, D]."""
    cfg, model, params = _setup()
    infer = build_infer_fn(model, cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    out = infer(params, imgs)
    lab = np.asarray(out["label_map"][0])
    assert lab.min() >= 0 and lab.max() <= cfg.group.max_detections


def test_mask_chunking_sharded_matches_unsharded():
    """The chunked mask stage (scan + scalar-predicate lax.cond) must
    compile and reproduce single-device outputs under the 8-device batch-DP
    mesh — the tiny config's D equals the default chunk so the other
    sharded test exercises only the dense path."""
    from kgtpu.parallel import make_mesh

    cfg, model, params = _setup()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, mask_chunk=8))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(8, 128, 128, 3),
                                    dtype=np.uint8))
    a = build_infer_fn(model, cfg)(params, imgs)
    b = build_infer_fn(model, cfg, mesh=make_mesh())(params, imgs)
    np.testing.assert_array_equal(np.asarray(a["label_map"]),
                                  np.asarray(b["label_map"]))
    np.testing.assert_array_equal(np.asarray(a["valid"]),
                                  np.asarray(b["valid"]))


def test_mask_chunking_matches_dense():
    """Chunked conditional mask stage (infer.mask_chunk, the roofline-driven
    round-3 optimization) must reproduce the dense all-slots apply exactly
    at every VALID slot — for a compacted valid prefix (the box_nms
    contract) and for scattered valid slots (every chunk's predicate
    exercised)."""
    from kgtpu.infer import _mask_batch
    from kgtpu.ops.nms import Boxes

    cfg, model, params = _setup()
    rng = np.random.default_rng(1)
    b, d = 2, cfg.group.max_detections
    feats_side = cfg.data.input_size // cfg.data.stride
    from kgtpu.infer import _detect_batch
    imgs = jnp.asarray(rng.normal(size=(b, 128, 128, 3)), jnp.float32)
    _, feats = _detect_batch(model, cfg, params, imgs)
    assert feats.shape[1] == feats_side

    boxes = np.zeros((b, d, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 20, (b, d))
    boxes[..., 1] = rng.uniform(0, 20, (b, d))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(3, 10, (b, d))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(3, 10, (b, d))
    scores = np.linspace(1.0, 0.1, d, dtype=np.float32)[None].repeat(b, 0)

    for name, valid in [
            ("prefix", np.arange(d)[None] < np.array([[3], [5]])),
            ("scattered", np.zeros((b, d), bool)),
            ("empty", np.zeros((b, d), bool))]:
        if name == "scattered":
            valid = valid.copy()
            valid[0, d - 1] = True    # last chunk only
            valid[1, 0] = True
        dets = Boxes(boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                     valid=jnp.asarray(valid))
        outs = {}
        for ch in (0, 8, 12):        # 12 does not divide D=32 (padded path)
            c = dataclasses.replace(
                cfg, infer=dataclasses.replace(cfg.infer, mask_chunk=ch))
            outs[ch] = _mask_batch(model, c, params, feats, dets, 128, 128)
        va = np.asarray(valid)
        for ch in (8, 12):
            np.testing.assert_allclose(
                np.asarray(outs[ch]["masks"])[va],
                np.asarray(outs[0]["masks"])[va],
                rtol=1e-6, atol=1e-6, err_msg=f"{name} ch={ch}")
            np.testing.assert_array_equal(np.asarray(outs[ch]["label_map"]),
                                          np.asarray(outs[0]["label_map"]),
                                          err_msg=f"{name} ch={ch}")
            np.testing.assert_allclose(np.asarray(outs[ch]["score_map"]),
                                       np.asarray(outs[0]["score_map"]),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{name} ch={ch}")


def test_multiscale_runs_and_merges():
    cfg, model, params = _setup()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, test_scales=(0.5, 1.0)))
    ms = build_multiscale_fn(model, cfg)
    imgs = {
        "0.5": jnp.zeros((64, 64, 3)),
        "1": jnp.zeros((128, 128, 3)),
    }
    out = ms(params, imgs)
    assert out["label_map"].shape == (128, 128)
    assert out["boxes"].shape == (cfg.group.max_detections, 4)


def test_rescore_by_maskness_math_and_gate():
    """--mask_rescore w: score *= maskness^w (mean prob over the mask's own
    foreground), and the score gate re-applies to the rescored score."""
    from kgtpu.infer import _rescore_by_maskness
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        group=dataclasses.replace(cfg.group, mask_thresh=0.5,
                                  score_thresh=0.3),
        infer=dataclasses.replace(cfg.infer, mask_rescore=1.0))
    m = 4
    probs = np.zeros((1, 3, m, m), np.float32)
    probs[0, 0] = 0.9                      # maskness 0.9
    probs[0, 1, :, :2] = 0.8               # fg half at 0.8 -> maskness 0.8
    probs[0, 1, :, 2:] = 0.2
    probs[0, 2] = 0.2                      # no fg -> maskness 0
    scores = jnp.asarray([[0.9, 0.4, 0.9]])
    valid = jnp.asarray([[True, True, True]])
    s2, v2 = _rescore_by_maskness(cfg, jnp.asarray(probs), scores, valid)
    np.testing.assert_allclose(np.asarray(s2[0]), [0.81, 0.32, 0.0],
                               atol=1e-6)
    assert np.asarray(v2[0]).tolist() == [True, True, False]
    # w=0 is the identity
    cfg0 = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, mask_rescore=0.0))
    s0, v0 = _rescore_by_maskness(cfg0, jnp.asarray(probs), scores, valid)
    assert s0 is scores and v0 is valid


def test_mask_rescore_keeps_valid_prefix():
    """With the rescore gate on, outputs must keep the kept-first slot
    compaction (label ids 1..k) that eval.py and test.py rely on."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, mask_rescore=1.0))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    fn = build_infer_fn(model, cfg)
    img = (np.random.default_rng(0)
           .integers(0, 255, (1, 128, 128, 3)).astype(np.uint8))
    out = fn(state.params, img)
    valid = np.asarray(out["valid"][0])
    k = int(valid.sum())
    assert valid[:k].all() and not valid[k:].any()     # prefix property
    lab = np.asarray(out["label_map"][0])
    assert set(np.unique(lab)) <= set(range(k + 1))    # ids 1..k only
