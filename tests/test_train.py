"""Train-step tests (C14): jit, finiteness, param updates, DP sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import build_dataset, batch_iterator, make_batch
from kgtpu.models import KGNet
from kgtpu.parallel import make_mesh, shard_batch


def _setup(batch_size=2):
    cfg = tiny_test_config()
    # warmup starts at lr=0; use a 1-step warmup so step 0 already updates
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr_warmup_steps=1))
    rng = jax.random.PRNGKey(0)
    state = train_lib.create_train_state(cfg, rng)
    model = KGNet(cfg=cfg.model)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, list(range(batch_size)), cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    return cfg, model, state, batch, rng


def test_step_finite_and_updates_params():
    cfg, model, state, batch, rng = _setup()
    step = train_lib.make_train_step(model, cfg)
    before = jax.tree.map(np.asarray, state.params)
    state2, metrics = step(state, batch, rng)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["loss"]) > 0
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()),
                         state2.params, before)
    assert max(jax.tree.leaves(diffs)) > 0


def test_grads_no_nan_with_empty_image():
    """An image with zero valid instances must not produce NaNs."""
    cfg, model, state, batch, rng = _setup()
    batch = dict(batch)
    batch["valid"] = np.zeros_like(batch["valid"])
    batch["label_map"] = np.zeros_like(batch["label_map"])
    step = train_lib.make_train_step(model, cfg)
    _, metrics = step(state, batch, rng)
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_sharded_step_matches_single_device():
    """DP over the 8 fake CPU devices must match unsharded numerics."""
    cfg, model, state, _, rng = _setup()
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, list(range(8)), cfg.data, augment=False,
                       rng=np.random.default_rng(0))

    step1 = train_lib.make_train_step(model, cfg)
    s1, m1 = step1(state, batch, rng)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state_repl = jax.device_put(
        train_lib.create_train_state(cfg, jax.random.PRNGKey(0)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    step8 = train_lib.make_train_step(model, cfg, mesh=mesh)
    s8, m8 = step8(state_repl, shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_loss_decreases_over_steps():
    cfg, model, state, batch, rng = _setup()
    step = train_lib.make_train_step(model, cfg)
    first = None
    for i in range(10):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
