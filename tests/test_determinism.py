"""Bitwise determinism (SURVEY.md §7.3 item 2): identical inputs → identical
detections/label maps across runs, and documented tie order everywhere."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import train_lib
from kgtpu.config import tiny_test_config
from kgtpu.data import build_dataset
from kgtpu.data.loader import _prepare_sample
from kgtpu.infer import build_infer_fn
from kgtpu.models import KGNet


def test_inference_bitwise_deterministic_across_calls():
    cfg = tiny_test_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    ds = build_dataset(cfg.data, split="val")
    s = _prepare_sample(ds[0], cfg.data, augment=False,
                        rng=np.random.default_rng(0), image_only=True)
    img = jnp.asarray(s["image"][None])

    infer_a = build_infer_fn(model, cfg)
    infer_b = build_infer_fn(model, cfg)   # fresh jit cache entry
    a = infer_a(state.params, img)
    b = infer_b(state.params, img)
    for k in ("boxes", "scores", "valid", "label_map"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_train_step_deterministic_same_seed():
    cfg = tiny_test_config()
    from kgtpu.data import make_batch
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    model = KGNet(cfg=cfg.model)

    outs = []
    for _ in range(2):
        state = train_lib.create_train_state(cfg, jax.random.PRNGKey(3))
        step = train_lib.make_train_step(model, cfg)
        state, metrics = step(state, batch, jax.random.PRNGKey(9))
        outs.append((jax.tree.map(np.asarray, state.params),
                     float(metrics["loss"])))
    (pa, la), (pb, lb) = outs
    assert la == lb
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(x, y)
