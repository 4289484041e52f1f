"""Remat (activation checkpointing) tests: transparent numerics, finite grads."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import build_dataset, make_batch
from kgtpu.models import KGNet


def test_remat_matches_plain_forward_and_backward():
    cfg = tiny_test_config()
    cfg_r = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, remat=True))

    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    state_r = train_lib.create_train_state(cfg_r, rng)
    # structurally identical params: remat is checkpoint-compatible
    assert (jax.tree_util.tree_structure(state.params)
            == jax.tree_util.tree_structure(state_r.params))
    state_r = state_r.replace(params=state.params)

    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))

    # same params through both: remat must be functionally transparent
    model, model_r = KGNet(cfg=cfg.model), KGNet(cfg=cfg_r.model)
    out = model.apply({"params": state.params}, jnp.asarray(batch["image"]))
    out_r = model_r.apply({"params": state_r.params},
                          jnp.asarray(batch["image"]))
    np.testing.assert_allclose(np.asarray(out["stacks"][-1]["hm"]),
                               np.asarray(out_r["stacks"][-1]["hm"]),
                               rtol=1e-5, atol=1e-5)

    step = train_lib.make_train_step(model_r, cfg_r)
    state_r2, metrics = step(state_r, batch, rng)
    assert all(np.isfinite(float(v)) for v in metrics.values())
