"""Checkpoint semantics tests (C18): epoch naming, resume, params-only load."""

import os

import jax
import numpy as np
import pytest

from kgtpu import checkpoint, train_lib
from kgtpu.config import tiny_test_config


@pytest.fixture(scope="module")
def state():
    cfg = tiny_test_config()
    return train_lib.create_train_state(cfg, jax.random.PRNGKey(0))


def test_save_restore_roundtrip(tmp_path, state):
    d = str(tmp_path / "weights")
    p = checkpoint.save(d, epoch=3, state=state)
    assert os.path.basename(p) == "model_3"
    out = checkpoint.restore(d, state=state)
    assert out["epoch"] == 3
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(out["state"].params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_roundtrip(tmp_path, state):
    """block=False queues the write; after wait() the checkpoint must be
    finalized, atomic, and bit-identical to a sync save's contents."""
    d = str(tmp_path / "weights")
    p = checkpoint.save(d, epoch=5, state=state, block=False)
    checkpoint.wait()
    assert os.path.isdir(p)
    out = checkpoint.restore(d, state=state)
    assert out["epoch"] == 5
    for x, y in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(out["state"].params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_latest_selection(tmp_path, state):
    d = str(tmp_path / "weights")
    checkpoint.save(d, epoch=1, state=state)
    checkpoint.save(d, epoch=10, state=state)
    checkpoint.save(d, epoch=2, state=state)
    assert checkpoint.resolve(d).endswith("model_10")


def test_resolve_best_selector(tmp_path, state):
    """`<dir>/best` resolves through the best.json marker that train.py's
    --eval_every best tracking writes; missing marker raises with a hint."""
    import json

    d = str(tmp_path / "weights")
    checkpoint.save(d, epoch=3, state=state)
    checkpoint.save(d, epoch=7, state=state)
    with pytest.raises(FileNotFoundError):
        checkpoint.resolve(os.path.join(d, "best"))
    with open(os.path.join(d, "best.json"), "w") as f:
        json.dump({"epoch": 3, "metric": 0.9}, f)
    assert checkpoint.resolve(os.path.join(d, "best")).endswith("model_3")
    assert checkpoint.resolve(d).endswith("model_7")   # latest unaffected


def test_restore_params_only(tmp_path, state):
    d = str(tmp_path / "weights")
    path = checkpoint.save(d, epoch=0, state=state)
    params = checkpoint.restore_params(path)
    x = jax.tree.leaves(params)
    y = jax.tree.leaves(state.params)
    assert len(x) == len(y)
    np.testing.assert_array_equal(x[0], np.asarray(y[0]))


def test_resolve_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        checkpoint.resolve(str(tmp_path / "nope"))


def test_resume_restore_with_extra_payload(tmp_path, state):
    """Regression: train.py checkpoints always carry an `extra` stats dict;
    restore(state=...) must tolerate it (partial restore) — this is the
    exact shape every real `--resume` sees."""
    d = str(tmp_path / "weights")
    extra = {"max_gt_box_side_px": np.float32(40.0),
             "config_json": np.frombuffer(b'{"x":1}', np.uint8).copy()}
    checkpoint.save(d, epoch=7, state=state, extra=extra)
    out = checkpoint.restore(d, state=state)
    assert out["epoch"] == 7
    for x, y in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(out["state"].params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_init_params_from_loads_weights_only(tmp_path, state):
    """--init_from: params (and batch_stats) come from the checkpoint;
    optimizer state, step and EMA restart fresh; architecture mismatch
    fails fast."""
    import dataclasses

    import jax

    from kgtpu import train_lib
    from kgtpu.config import tiny_test_config

    d = str(tmp_path / "w")
    # a "trained" checkpoint: perturb the params so they differ from init
    trained = state.replace(
        params=jax.tree.map(lambda p: p + 1.0, state.params), step=123)
    checkpoint.save(d, epoch=9, state=trained)

    cfg = dataclasses.replace(
        tiny_test_config(),
        train=dataclasses.replace(tiny_test_config().train, ema_decay=0.9))
    fresh = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    out = checkpoint.init_params_from(fresh, d)
    a = jax.tree.leaves(out.params)[0]
    b = jax.tree.leaves(trained.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(out.step) == 0                      # fresh optimizer/step
    e = jax.tree.leaves(out.ema_params)[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(a))  # EMA restarts

    # mismatched architecture -> fail fast with differing leaves
    cfg2 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, base_channels=48))
    other = train_lib.create_train_state(cfg2, jax.random.PRNGKey(0))
    with pytest.raises(SystemExit, match="differing leaves"):
        checkpoint.init_params_from(other, d)


def test_prune_keeps_newest_and_best(tmp_path, state):
    """--keep_last retention: newest N survive, the best.json epoch is
    protected, in-flight tmp dirs untouched."""
    import json

    d = str(tmp_path / "w")
    for e in (1, 3, 5, 7, 9):
        checkpoint.save(d, epoch=e, state=state)
    with open(os.path.join(d, "best.json"), "w") as f:
        json.dump({"epoch": 3, "metric": 0.9}, f)
    os.makedirs(os.path.join(d, "model_11.orbax-checkpoint-tmp"))

    deleted = checkpoint.prune(d, keep_last=2)
    left = sorted(x for x in os.listdir(d) if x.startswith("model_"))
    assert left == ["model_11.orbax-checkpoint-tmp", "model_3", "model_7",
                    "model_9"]
    assert sorted(os.path.basename(p) for p in deleted) == ["model_1",
                                                            "model_5"]
    # protected best still restores
    assert checkpoint.resolve(os.path.join(d, "best")).endswith("model_3")
    # keep_last=0 is a no-op
    assert checkpoint.prune(d, keep_last=0) == []


def test_prune_honors_pinned_epochs(tmp_path, state):
    """Epochs listed in save_dir/pinned.json (the artifacts behind published
    numbers — docs/OPERATIONS.md) survive any --keep_last setting."""
    import json

    d = str(tmp_path / "w")
    for e in (1, 2, 3, 4, 5):
        checkpoint.save(d, epoch=e, state=state)
    with open(os.path.join(d, "pinned.json"), "w") as f:
        json.dump([1, 3], f)

    checkpoint.prune(d, keep_last=1)
    left = sorted(x for x in os.listdir(d) if x.startswith("model_"))
    assert left == ["model_1", "model_3", "model_5"]
