"""Tests for the center+wh decode mode (OPEN-2 head; GroupConfig.method)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet
from kgtpu.ops.decode import decode_center_wh


def test_decode_center_wh_recovers_boxes():
    h = w = 32
    hm = np.full((h, w, 5), -10.0, np.float32)
    wh = np.zeros((h, w, 2), np.float32)
    gt = [(8, 10, 6.0, 4.0, 5.0), (20, 24, 10.0, 8.0, 4.0)]  # cx, cy, w, h, logit
    for cx, cy, bw, bh, logit in gt:
        hm[cy, cx, 4] = logit
        wh[cy, cx] = (bw, bh)
    reg = np.full((h, w, 2), 0.5, np.float32)
    out = decode_center_wh(jnp.asarray(hm), jnp.asarray(reg), jnp.asarray(wh),
                           k=8, score_thresh=0.3)
    v = np.asarray(out.valid)
    assert v.sum() == 2
    boxes = np.asarray(out.boxes)[v]
    for cx, cy, bw, bh, _ in gt:
        want = np.asarray([cx + 0.5 - bw / 2, cy + 0.5 - bh / 2,
                           cx + 0.5 + bw / 2, cy + 0.5 + bh / 2])
        assert np.abs(boxes - want).max(axis=-1).min() < 1e-5


def test_centernet_infer_pipeline_runs():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, use_wh_head=True),
        group=dataclasses.replace(cfg.group, method="centernet"))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    infer = build_infer_fn(model, cfg)
    out = infer(state.params, jnp.zeros((1, 128, 128, 3)))
    assert out["boxes"].shape == (1, cfg.group.max_detections, 4)


def test_centernet_without_wh_head_errors():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        # wh head is on by default now — disable it explicitly to exercise
        # the configuration-error path
        model=dataclasses.replace(cfg.model, use_wh_head=False),
        group=dataclasses.replace(cfg.group, method="centernet"))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    infer = build_infer_fn(model, cfg)
    with pytest.raises(ValueError, match="use_wh_head"):
        infer(state.params, jnp.zeros((1, 128, 128, 3)))
