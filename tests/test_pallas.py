"""Pallas kernel tests: interpret-mode parity on CPU, compiled parity on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgtpu.ops import targets as tops
from kgtpu.ops.pallas.gaussian import render_heatmaps_pallas


def _scene(seed=0, n=32, h=128, w=128, n_valid=24):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, w - 30, n)
    y0 = rng.uniform(0, h - 30, n)
    bw = rng.uniform(3, 25, n)
    bh = rng.uniform(3, 25, n)
    boxes = np.stack([x0, y0, np.minimum(x0 + bw, w - 1),
                      np.minimum(y0 + bh, h - 1)], -1).astype(np.float32)
    kpts = tops.keypoints_from_boxes(jnp.asarray(boxes))
    sizes = jnp.stack([boxes[:, 3] - boxes[:, 1],
                       boxes[:, 2] - boxes[:, 0]], -1)
    valid = (jnp.arange(n) < n_valid).astype(jnp.float32)
    return kpts, sizes, valid, h, w


def test_pallas_gaussian_interpret_parity():
    kpts, sizes, valid, h, w = _scene()
    want = np.asarray(tops.render_heatmaps(kpts, sizes, valid, h, w))
    got = np.asarray(render_heatmaps_pallas(kpts, sizes, valid, h, w,
                                            interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pallas_gaussian_interpret_empty():
    kpts, sizes, valid, h, w = _scene(n_valid=0)
    got = np.asarray(render_heatmaps_pallas(kpts, sizes, valid, h, w,
                                            interpret=True))
    assert got.max() == 0.0


@pytest.mark.tpu
def test_pallas_gaussian_tpu_parity():
    kpts, sizes, valid, h, w = _scene(seed=3, n=128, n_valid=100)
    want = np.asarray(jax.jit(
        lambda k, s, v: tops.render_heatmaps(k, s, v, h, w))(kpts, sizes, valid))
    got = np.asarray(jax.jit(
        lambda k, s, v: render_heatmaps_pallas(k, s, v, h, w))(kpts, sizes, valid))
    np.testing.assert_allclose(got, want, atol=1e-6)
