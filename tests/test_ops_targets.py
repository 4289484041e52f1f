"""Golden-parity tests for on-device Gaussian target rendering (C4)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.ops import targets
from tests.golden import oracles


def _random_instances(rng, n, h, w, n_valid=None):
    x0 = rng.uniform(0, w - 8, n)
    y0 = rng.uniform(0, h - 8, n)
    bw = rng.uniform(4, w / 2, n)
    bh = rng.uniform(4, h / 2, n)
    boxes = np.stack([x0, y0, np.minimum(x0 + bw, w - 1),
                      np.minimum(y0 + bh, h - 1)], axis=-1).astype(np.float32)
    valid = np.zeros(n, bool)
    valid[: (n_valid if n_valid is not None else n)] = True
    return boxes, valid


def test_gaussian_radius_matches_oracle():
    rng = np.random.default_rng(0)
    sizes = rng.uniform(1, 100, size=(64, 2)).astype(np.float32)
    got = np.asarray(targets.gaussian_radius(jnp.asarray(sizes)))
    want = np.array([oracles.gaussian_radius(s[0], s[1]) for s in sizes])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_keypoints_from_boxes():
    boxes = jnp.array([[2.0, 3.0, 10.0, 7.0]])
    kp = np.asarray(targets.keypoints_from_boxes(boxes))[0]
    np.testing.assert_allclose(
        kp,
        [[2, 3], [10, 3], [2, 7], [10, 7], [6, 5]],
    )


def test_render_heatmaps_matches_oracle():
    rng = np.random.default_rng(1)
    h = w = 48
    boxes, valid = _random_instances(rng, n=10, h=h, w=w, n_valid=7)
    kpts = np.asarray(targets.keypoints_from_boxes(jnp.asarray(boxes)))
    sizes = np.stack([boxes[:, 3] - boxes[:, 1], boxes[:, 2] - boxes[:, 0]], -1)

    got = np.asarray(
        jax.jit(
            lambda k, s, v: targets.render_heatmaps(k, s, v, h, w)
        )(jnp.asarray(kpts), jnp.asarray(sizes), jnp.asarray(valid))
    )
    want = oracles.render_heatmaps(kpts, sizes, valid, h, w)
    assert got.shape == (h, w, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # peaks must be exactly 1 at each valid (floored) keypoint pixel
    for i in range(7):
        for c in range(5):
            xi, yi = int(np.floor(kpts[i, c, 0])), int(np.floor(kpts[i, c, 1]))
            if 0 <= xi < w and 0 <= yi < h:
                assert got[yi, xi, c] > 0.999


def test_render_heatmaps_all_padding_is_zero():
    h = w = 32
    kpts = jnp.zeros((4, 5, 2))
    sizes = jnp.ones((4, 2))
    valid = jnp.zeros((4,))
    hm = targets.render_heatmaps(kpts, sizes, valid, h, w)
    assert float(jnp.max(hm)) == 0.0


def test_render_heatmaps_batch_and_chunking():
    rng = np.random.default_rng(2)
    h = w = 32
    boxes, valid = _random_instances(rng, n=5, h=h, w=w)  # 5 % chunk != 0
    kpts = targets.keypoints_from_boxes(jnp.asarray(boxes))
    sizes = jnp.stack([boxes[:, 3] - boxes[:, 1], boxes[:, 2] - boxes[:, 0]], -1)
    single = targets.render_heatmaps(kpts, sizes, jnp.asarray(valid), h, w)
    batched = targets.render_heatmaps_batch(
        kpts[None], sizes[None], jnp.asarray(valid)[None], h, w
    )
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single),
                               rtol=1e-6, atol=1e-6)
