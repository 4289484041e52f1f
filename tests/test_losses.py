"""Loss-function tests (C8)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu import losses


def test_focal_loss_matches_numpy_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 8, 5)).astype(np.float32)
    t = np.clip(rng.uniform(0, 1.2, (8, 8, 5)), 0, 1).astype(np.float32)
    t[t > 0.95] = 1.0   # ensure some exact positives

    p = 1 / (1 + np.exp(-logits.astype(np.float64)))
    pos = (t >= 1.0)
    pos_l = -((1 - p) ** 2) * np.log(p)
    neg_l = -((1 - t) ** 4) * (p ** 2) * np.log(1 - p)
    want = (pos_l[pos].sum() + neg_l[~pos].sum()) / max(pos.sum(), 1)

    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_focal_loss_perfect_prediction_small():
    t = np.zeros((16, 16, 5), np.float32)
    t[4, 4, 0] = 1.0
    logits = np.where(t >= 1.0, 12.0, -12.0).astype(np.float32)
    assert float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(t))) < 1e-3


def test_offset_loss_zero_when_exact():
    kpts = jnp.asarray([[[3.25, 4.5]] * 5])               # [1, 5, 2]
    reg = jnp.zeros((16, 16, 2)).at[4, 3].set(jnp.asarray([0.25, 0.5]))
    out = losses.offset_loss(reg, kpts, jnp.ones(1))
    assert float(out) < 1e-6


def test_offset_loss_ignores_invalid_and_oob():
    kpts = jnp.asarray([[[100.0, 100.0]] * 5, [[2.5, 2.5]] * 5])
    reg = jnp.ones((8, 8, 2))
    # instance 0 out of bounds, instance 1 invalid → denominator guard
    out = losses.offset_loss(reg, kpts, jnp.asarray([1.0, 0.0]))
    assert np.isfinite(float(out))


def test_mask_loss_perfect_vs_wrong():
    t = np.zeros((2, 8, 8), np.float32)
    t[:, 2:6, 2:6] = 1.0
    good = np.where(t > 0, 10.0, -10.0).astype(np.float32)
    bad = -good
    valid = jnp.ones(2)
    lg = float(losses.mask_loss(jnp.asarray(good), jnp.asarray(t), valid))
    lb = float(losses.mask_loss(jnp.asarray(bad), jnp.asarray(t), valid))
    assert lg < 0.01 and lb > 1.0


def test_mask_loss_invalid_only_is_finite():
    out = losses.mask_loss(jnp.zeros((1, 4, 4)), jnp.zeros((1, 4, 4)),
                           jnp.zeros(1))
    assert np.isfinite(float(out))


def test_wh_loss():
    # supervised at ALL 5 keypoint pixels (corners + center): zero loss only
    # when the map carries (w, h) at every one of them
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 8.0]])   # w=8, h=6, center (6, 5)
    wh = jnp.zeros((16, 16, 2))
    for (x, y) in [(2, 2), (10, 2), (2, 8), (10, 8), (6, 5)]:
        wh = wh.at[y, x].set(jnp.asarray([8.0, 6.0]))
    assert float(losses.wh_loss(wh, boxes, jnp.ones(1))) < 1e-6
    # center-only supervision is no longer sufficient
    wh_center_only = jnp.zeros((16, 16, 2)).at[5, 6].set(
        jnp.asarray([8.0, 6.0]))
    assert float(losses.wh_loss(wh_center_only, boxes, jnp.ones(1))) > 1.0
    # out-of-frame corners are masked, not gathered at clamped pixels:
    # poison the border row/col a clamped gather would read
    edge = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])   # TR/BL/BR at exactly 16
    wh_edge = jnp.full((16, 16, 2), 16.0)
    wh_edge = wh_edge.at[15, :].set(999.0).at[:, 15].set(999.0)
    assert float(losses.wh_loss(wh_edge, edge, jnp.ones(1))) < 1e-6
