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


def test_sharded_step_ema_and_batchnorm_state():
    """EMA params and BatchNorm running stats must stay correct under the
    8-device mesh: replicated sharding in, finite + matching-unsharded out
    (VERDICT.md round-1 item 4 — state under the mesh was untested)."""
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, norm="batch"),
        train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                  lr_warmup_steps=1))
    model = KGNet(cfg=cfg.model)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, list(range(8)), cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    rng = jax.random.PRNGKey(0)

    state1 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    assert state1.batch_stats is not None and state1.ema_params is not None
    s1, _ = train_lib.make_train_step(model, cfg)(state1, batch, rng)

    mesh = make_mesh()
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state8 = jax.device_put(
        train_lib.create_train_state(cfg, jax.random.PRNGKey(0)), repl)
    s8, m8 = train_lib.make_train_step(model, cfg, mesh=mesh)(
        state8, shard_batch(batch, mesh), rng)

    assert np.isfinite(float(m8["loss"]))
    # GSPMD gives sync-BN for free: the sharded running stats must equal the
    # full-batch (unsharded) stats, not one shard's
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree.leaves(s1.ema_params),
                    jax.tree.leaves(s8.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_tiled_sharded_matches_unsharded():
    """Spatial DP: the tile-sharded whole-slide program must produce the
    same stitched output as the unsharded one (VERDICT.md item 4 — only the
    train step had a sharded-equivalence test)."""
    from kgtpu.infer import build_tiled_infer_fn

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, tile_size=64,
                                       tile_overlap=16))
    model = KGNet(cfg=cfg.model)
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(160, 160, 3)), jnp.float32)

    plain = build_tiled_infer_fn(model, cfg, (160, 160), tile_batch=8)
    out1 = plain(state.params, image)

    mesh = make_mesh()
    sharded = build_tiled_infer_fn(model, cfg, (160, 160), mesh=mesh,
                                   tile_batch=8)
    out8 = sharded(state.params, image)

    np.testing.assert_array_equal(np.asarray(out1["label_map"]),
                                  np.asarray(out8["label_map"]))
    np.testing.assert_allclose(np.asarray(out1["scores"]),
                               np.asarray(out8["scores"]), atol=2e-4)


def test_resume_matches_uninterrupted_training(tmp_path):
    """The restart/resume contract behind --resume and the host-RSS
    watchdog: train 2 epochs, checkpoint, restore into a FRESH state, train
    2 more — params/opt/EMA must bit-match 4 uninterrupted epochs (the
    no-RNG-in-checkpoint design: per-step keys are fold_in(seed,
    epoch*100000+step) and the loader reseeds per epoch, so the schedule
    position is the only state — and it is saved)."""
    from kgtpu import checkpoint

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr_warmup_steps=1, lr_schedule="cosine",
            num_epochs=4, steps_per_epoch=2, ema_decay=0.9))
    model = KGNet(cfg=cfg.model)
    ds = build_dataset(cfg.data)
    rng = jax.random.PRNGKey(cfg.train.seed)
    step_fn = train_lib.make_train_step(model, cfg, mesh=None)

    def run_epochs(state, start, stop):
        for epoch in range(start, stop):
            it = batch_iterator(ds, cfg.data, cfg.train.batch_size,
                                augment=True, seed=cfg.train.seed + epoch,
                                steps=cfg.train.steps_per_epoch)
            for i, batch in enumerate(it):
                state, _ = step_fn(
                    state, batch,
                    jax.random.fold_in(rng, epoch * 100_000 + i))
        return state

    straight = run_epochs(train_lib.create_train_state(cfg, rng), 0, 4)

    half = run_epochs(train_lib.create_train_state(cfg, rng), 0, 2)
    d = str(tmp_path / "w")
    checkpoint.save(d, epoch=1, state=half,
                    extra={"max_gt_box_side_px": np.float32(1.0)})
    fresh = train_lib.create_train_state(cfg, rng)
    out = checkpoint.restore(d, state=fresh)
    assert out["epoch"] == 1
    resumed = run_epochs(out["state"], out["epoch"] + 1, 4)

    for name, a, b in [("params", straight.params, resumed.params),
                       ("ema", straight.ema_params, resumed.ema_params)]:
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=name)
    assert int(straight.step) == int(resumed.step)


def test_multi_step_dispatch_matches_single_steps():
    """k steps scanned in ONE dispatch (make_train_multi_step) compute the
    same update sequence as k single-step dispatches: same per-step RNG keys
    (fold_in of the same offsets), same final params/EMA/opt-state, same
    per-step losses."""
    k = 3
    cfg, model, state, _, rng = _setup()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    ds = build_dataset(cfg.data)
    nprng = np.random.default_rng(0)
    batches = [make_batch(ds, [2 * j, 2 * j + 1], cfg.data, augment=False,
                          rng=nprng) for j in range(k)]

    step = train_lib.make_train_step(model, cfg)
    s_ref = state
    losses_ref = []
    for j, b in enumerate(batches):
        s_ref, m = step(s_ref, b, jax.random.fold_in(rng, 7 + j))
        losses_ref.append(float(m["loss"]))

    multi = train_lib.make_train_multi_step(model, cfg, k)
    state2 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    stacked = {key: np.stack([b[key] for b in batches])
               for key in batches[0]}
    offs = np.arange(7, 7 + k, dtype=np.int32)
    s_multi, ms = multi(state2, stacked, rng, offs)

    np.testing.assert_allclose(np.asarray(ms["loss"]), losses_ref, rtol=1e-5)
    assert int(s_multi.step) == int(s_ref.step) == k
    for a, b in zip(jax.tree.leaves(s_ref.params),
                    jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.ema_params),
                    jax.tree.leaves(s_multi.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_multi_step_dispatch_sharded():
    """The multi-step dispatch under the 8-device mesh: compiles, runs, and
    matches the unsharded multi-step numerics."""
    k = 2
    cfg, model, _, _, rng = _setup()
    ds = build_dataset(cfg.data)
    nprng = np.random.default_rng(0)
    batches = [make_batch(ds, list(range(8 * j, 8 * j + 8)), cfg.data,
                          augment=False, rng=nprng) for j in range(k)]
    stacked = {key: np.stack([b[key] for b in batches])
               for key in batches[0]}
    offs = np.arange(k, dtype=np.int32)

    state1 = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    multi1 = train_lib.make_train_multi_step(model, cfg, k)
    s1, m1 = multi1(state1, stacked, rng, offs)

    mesh = make_mesh()
    state8 = jax.device_put(
        train_lib.create_train_state(cfg, jax.random.PRNGKey(0)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    multi8 = train_lib.make_train_multi_step(model, cfg, k, mesh=mesh)
    s8, m8 = multi8(state8, stacked, rng, offs)

    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m8["loss"]),
                               rtol=2e-4)
    a = jax.tree.leaves(s1.params)[0]
    b = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
