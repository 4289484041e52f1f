"""BatchNorm (running stats, sync under DP) + EMA-params tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import checkpoint, train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import build_dataset, make_batch
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet


def _bn_cfg():
    cfg = tiny_test_config()
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, norm="batch"),
        train=dataclasses.replace(cfg.train, lr_warmup_steps=1))


def test_batchnorm_stats_update_and_infer(tmp_path):
    cfg = _bn_cfg()
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    assert state.batch_stats is not None
    stats0 = jax.tree.map(np.asarray, state.batch_stats)

    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))

    # running stats must have moved (both backbone and mask head subtrees)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        state.batch_stats, stats0)
    leaves = jax.tree.leaves(moved)
    assert max(leaves) > 0
    assert "mask_head" in state.batch_stats
    mh_moved = jax.tree.leaves(moved["mask_head"])
    assert max(mh_moved) > 0

    # inference path takes full variables; checkpoint roundtrips them
    p = checkpoint.save(str(tmp_path / "w"), epoch=0, state=state)
    variables = checkpoint.restore_params(p)
    assert "batch_stats" in variables
    infer = build_infer_fn(model, cfg)
    out = infer(variables, jnp.zeros((1, 128, 128, 3)))
    assert out["label_map"].shape == (1, 128, 128)


def test_ema_params_track_training(tmp_path):
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       lr_warmup_steps=1))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    assert state.ema_params is not None

    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    p0 = jax.tree.leaves(jax.tree.map(np.asarray, state.params))[0]
    for i in range(3):
        state, _ = step(state, batch, jax.random.fold_in(rng, i))
    p = jax.tree.leaves(state.params)[0]
    e = jax.tree.leaves(state.ema_params)[0]
    # EMA moved off init but lags the raw params
    assert float(np.abs(np.asarray(e) - p0).max()) > 0
    assert float(np.abs(np.asarray(e) - np.asarray(p)).max()) > 1e-9

    path = checkpoint.save(str(tmp_path / "w"), epoch=0, state=state)
    ema_loaded = checkpoint.restore_params(path, use_ema=True)
    np.testing.assert_array_equal(jax.tree.leaves(ema_loaded)[0],
                                  np.asarray(jax.tree.leaves(state.ema_params)[0]))


def test_ema_warmup_sheds_init_quickly():
    """Early-step EMA must track the raw params, not the random init: with a
    flat decay 0.999 a 200-step run leaves 0.999^200 = 82% of the INIT in
    the average, which silently zeroed short-schedule --use_ema evals
    (round-2 regression).  The warmup min(d, (1+t)/(10+t)) bounds the init
    weight by prod_t (1+t)/(10+t) — already < 3% after 10 steps."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999,
                                       lr_warmup_steps=1))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)
    step = train_lib.make_train_step(model, cfg)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    p0 = jax.tree.map(np.asarray, state.params)
    for i in range(10):
        state, _ = step(state, batch, jax.random.fold_in(rng, i))
    # distance(EMA, params) must be far smaller than distance(EMA, init):
    # with flat 0.999 decay the ratio would be ~99/1 the other way
    d_init = sum(float(np.abs(np.asarray(e) - i0).sum()) for e, i0 in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(p0)))
    d_par = sum(float(np.abs(np.asarray(e) - np.asarray(p)).sum())
                for e, p in zip(jax.tree.leaves(state.ema_params),
                                jax.tree.leaves(state.params)))
    assert d_par < 0.2 * d_init, (d_par, d_init)
