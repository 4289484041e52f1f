"""Fixed-seed end-to-end smoke (SURVEY.md §4): train a tiny model on
synthetic blobs, run the full two-stage inference, assert AP above a floor."""

import dataclasses

import jax
import numpy as np
import pytest

from kgtpu import evaluate, train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import build_dataset, batch_iterator
from kgtpu.data.loader import _prepare_sample
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet


@pytest.mark.slow
def test_train_then_infer_ap_floor():
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr=1e-3, lr_warmup_steps=50))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)

    ds = build_dataset(cfg.data)
    first = last = None
    for i, batch in enumerate(
            batch_iterator(ds, cfg.data, 2, steps=300, seed=0)):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < 0.6 * first, f"no learning: {first} -> {last}"

    val = build_dataset(cfg.data, split="val")
    infer = build_infer_fn(model, cfg)
    nprng = np.random.default_rng(0)
    recs = []
    for i in range(6):
        s = _prepare_sample(val[i], cfg.data, augment=False, rng=nprng)
        out = infer(state.params, s["image"][None])
        recs.append({"pred_label": np.asarray(out["label_map"][0]),
                     "scores": np.asarray(out["scores"][0]),
                     "gt_label": s["label_map"]})
    res = evaluate.evaluate_dsb2018(recs)
    assert res["mAP_dsb2018"] > 0.15, res
    coco = evaluate.evaluate_coco(recs)
    assert coco["AP50"] > 0.2, coco
