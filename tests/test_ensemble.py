"""Ensemble inference tests (`build_ensemble_fn`): cross-model merge.

The ensemble generalizes the C16 TTA merge across checkpoints (the
reference has no ensemble mode — this is rebuild-only surface).  Two
load-bearing invariants, pinned on CPU with tiny models:

  - **duplicated member is a no-op**: ensemble([m, m], [p, p]) reproduces
    multiscale(m)(p) exactly under both vote modes — the doubled variant
    pool contains only exact duplicates, NMS keeps the same survivors
    (score desc, lowest index tie-break), and the mean vote over 2V copies
    equals the mean over V.  Adding a model can therefore change results
    only through genuine cross-model disagreement, never through vote
    dilution bookkeeping.
  - **heterogeneous members** (different backbones, different param trees)
    jit into one program and keep the output contract, with the mask stage
    on the designated member.

`build_multiscale_fn` itself is the one-member case since round 5; its
behavior stays pinned by the TTA quality gates in tests/test_e2e.py and
test_infer.py::test_multiscale_runs_and_merges.
"""

import dataclasses

import jax
import numpy as np
import pytest

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.infer import build_ensemble_fn, build_multiscale_fn
from kgtpu.models import KGNet


def _tta_cfg(vote: str):
    # score/vote thresholds near zero: untrained nets on noise score ~0.1
    # (the -2.19 hm init bias), and a vacuously-empty detection set would
    # pin nothing
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        group=dataclasses.replace(
            cfg.group, score_thresh=0.0, kp_score_thresh=0.0,
            center_thresh=0.0, require_center=False, size_prune=0.0,
            min_box_size=0.0),
        infer=dataclasses.replace(
            cfg.infer, test_scales=(0.5, 1.0), test_flip=True,
            tta_vote=vote, tta_vote_thresh=0.0))


def _stacks(rng: np.random.Generator, batch: int = 2):
    return {
        "0.5": rng.integers(0, 256, (batch, 64, 64, 3)).astype(np.float32),
        "1": rng.integers(0, 256, (batch, 128, 128, 3)).astype(np.float32),
    }


@pytest.mark.parametrize("vote", ["max", "mean"])
def test_duplicated_member_is_noop(vote):
    cfg = _tta_cfg(vote)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    stacks = _stacks(np.random.default_rng(0))

    solo = build_multiscale_fn(model, cfg)(state.params, stacks)
    duo = build_ensemble_fn([model, model], cfg)(
        [state.params, state.params], stacks)

    assert np.asarray(solo["valid"]).sum() > 0, "vacuous: no detections"
    np.testing.assert_array_equal(np.asarray(duo["valid"]),
                                  np.asarray(solo["valid"]))
    np.testing.assert_allclose(np.asarray(duo["scores"]),
                               np.asarray(solo["scores"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(duo["label_map"]),
                                  np.asarray(solo["label_map"]))


def test_heterogeneous_members_contract():
    cfg = _tta_cfg("mean")
    unet_model_cfg = dataclasses.replace(
        cfg.model, backbone="unet", base_channels=16)
    cfg_a = cfg
    cfg_b = dataclasses.replace(cfg, model=unet_model_cfg)

    state_a = train_lib.create_train_state(cfg_a, jax.random.PRNGKey(1))
    state_b = train_lib.create_train_state(cfg_b, jax.random.PRNGKey(2))
    model_a, model_b = KGNet(cfg=cfg_a.model), KGNet(cfg=cfg_b.model)

    # mask stage on member 1 (unet): the shared cfg carries ITS ModelConfig
    # per the build_ensemble_fn contract (stage-2 crop geometry)
    ens = build_ensemble_fn([model_a, model_b], cfg_b, mask_member=1)
    out = ens([state_a.params, state_b.params],
              _stacks(np.random.default_rng(1)))

    d = cfg.group.max_detections
    m = cfg_b.model.mask_size
    assert out["boxes"].shape == (2, d, 4)
    assert out["masks"].shape == (2, d, m, m)
    assert out["label_map"].shape == (2, 128, 128)
    assert out["label_map"].dtype.name == "int32"
    assert np.isfinite(np.asarray(out["scores"])).all()
