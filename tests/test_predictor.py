"""Predictor (serving API) tests."""

import dataclasses

import jax
import numpy as np
import pytest

from kgtpu import checkpoint, train_lib
from kgtpu.config import tiny_test_config
from kgtpu.predictor import Predictor


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    cfg = tiny_test_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    d = str(tmp_path_factory.mktemp("w"))
    checkpoint.save(
        d, epoch=0, state=state,
        extra={"max_gt_box_side_px": np.asarray(40.0, np.float32),
               "train_input_size": np.asarray(128.0, np.float32)})
    return d


def test_predictor_from_checkpoint_and_predict(ckpt_dir):
    cfg = tiny_test_config()
    p = Predictor.from_checkpoint(ckpt_dir, cfg=cfg)
    # with wh-head size pruning active (the default) the dataset size prior
    # is NOT applied — ghost suppression is data-free now
    assert p.cfg.group.max_box_size >= 1e9

    # fallback path: size pruning disabled → prior from checkpoint stats
    # (1.5 * 40 px / stride 4 = 15)
    cfg_np = dataclasses.replace(
        cfg, group=dataclasses.replace(cfg.group, size_prune=0.0))
    p_np = Predictor.from_checkpoint(ckpt_dir, cfg=cfg_np)
    assert abs(p_np.cfg.group.max_box_size - 15.0) < 1e-6

    img = np.random.default_rng(0).integers(
        0, 255, size=(97, 130, 3), dtype=np.uint8)   # non-square, odd size
    out = p.predict(img)
    assert out["label_map"].shape == (97, 130)
    assert out["boxes"].shape[1] == 4 if len(out["boxes"]) else True
    assert out["num_instances"] == len(out["scores"])


def test_predictor_rejects_bad_canvas():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, input_size=100))
    state = train_lib.create_train_state(tiny_test_config(),
                                         jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="divisible"):
        Predictor(cfg, state.params)
