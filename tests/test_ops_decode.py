"""Golden-parity tests for the peak decoder (C9)."""

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.ops import decode
from tests.golden import oracles


def test_decode_matches_oracle_random():
    rng = np.random.default_rng(0)
    h, w, c, k = 24, 20, 5, 16
    hm = rng.normal(size=(h, w, c)).astype(np.float32)
    reg = rng.uniform(-0.5, 0.5, size=(h, w, 2)).astype(np.float32)

    got = jax.jit(lambda a, b: decode.decode_peaks(a, b, k))(
        jnp.asarray(hm), jnp.asarray(reg))
    want_s, want_c, want_i = oracles.decode_peaks(hm, reg, k)

    np.testing.assert_allclose(np.asarray(got.scores), want_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.indices), want_i)
    np.testing.assert_allclose(np.asarray(got.coords), want_c, rtol=1e-5, atol=1e-5)


def test_decode_finds_planted_peaks():
    h = w = 32
    k = 8
    hm = np.full((h, w, 5), -8.0, np.float32)
    pts = [(5, 7, 0), (20, 11, 0), (9, 25, 4)]
    for x, y, c in pts:
        hm[y, x, c] = 6.0
    reg = np.full((h, w, 2), 0.25, np.float32)
    got = decode.decode_peaks(jnp.asarray(hm), jnp.asarray(reg), k)
    s = np.asarray(got.scores)
    xy = np.asarray(got.coords)
    assert s[0, 0] > 0.99 and s[0, 1] > 0.99
    found0 = {tuple(xy[0, i]) for i in range(2)}
    assert (5.25, 7.25) in found0 and (20.25, 11.25) in found0
    assert s[4, 0] > 0.99 and tuple(xy[4, 0]) == (9.25, 25.25)
    # classes with no peaks: scores near sigmoid(-8) but suppressed neighbors = 0
    assert s[1, 0] < 1e-3


def test_decode_plateau_dedup_keeps_lowest_index():
    # a flat plateau of equal maxima yields ONE peak at the lowest row-major
    # index (framework tie rule); the rest of the plateau is suppressed
    hm = np.zeros((8, 8, 1), np.float32)
    hm[2:4, 3:5, 0] = 3.0                     # 2x2 plateau, min idx = 2*8+3
    got = decode.decode_peaks(jnp.asarray(hm), None, 4, apply_sigmoid=False)
    s = np.asarray(got.scores)[0]
    assert s[0] == 3.0 and np.asarray(got.indices)[0, 0] == 19
    assert s[1] < 3.0                         # plateau emitted exactly once


def test_decode_plateau_reference_mode_keeps_all():
    # dedup_plateaus=False restores the reference's keep-all behavior
    hm = np.zeros((8, 8, 1), np.float32)
    hm[2:4, 3:5, 0] = 3.0
    got = decode.decode_peaks(jnp.asarray(hm), None, 4, apply_sigmoid=False,
                              dedup_plateaus=False)
    np.testing.assert_array_equal(np.asarray(got.indices)[0],
                                  [19, 20, 27, 28])


def test_decode_dedup_matches_oracle_on_ties():
    # constructed ties: oracle dedup semantics == op dedup semantics
    rng = np.random.default_rng(3)
    hm = rng.integers(0, 4, size=(16, 16, 2)).astype(np.float32)  # many ties
    got = decode.decode_peaks(jnp.asarray(hm), None, 8, apply_sigmoid=False)
    want_s, _, want_i = oracles.decode_peaks(hm, None, 8, apply_sigmoid=False)
    np.testing.assert_allclose(np.asarray(got.scores), want_s, atol=1e-6)
    # positive-score rows must agree exactly (zero rows are padding)
    pos = want_s > 0
    np.testing.assert_array_equal(np.asarray(got.indices)[pos], want_i[pos])


def test_blocked_topk_equals_full_sort():
    """The 4×-smaller blocked top-k must return exactly what a full-map
    top_k returns on the same plateau-deduplicated NMS'd map (values AND
    indices), across random maps with and without ties."""
    from jax import lax

    for seed, tie in ((0, False), (1, True), (2, True)):
        rng = np.random.default_rng(seed)
        if tie:
            hm = rng.integers(0, 5, size=(32, 32, 3)).astype(np.float32)
        else:
            hm = rng.normal(size=(32, 32, 3)).astype(np.float32)
        prob = decode._maxpool_nms(jnp.asarray(hm), 3, True)
        k = 16
        bs, bi = decode._blocked_topk(prob, k)
        flat = prob.reshape(32 * 32, 3).T
        fs, fi = lax.top_k(flat, k)
        # full top_k tie order is flat-index asc == the blocked re-sort order
        np.testing.assert_allclose(np.asarray(bs), np.asarray(fs), atol=0)
        pos = np.asarray(fs) > 0          # zero rows are arbitrary padding
        np.testing.assert_array_equal(np.asarray(bi)[pos],
                                      np.asarray(fi)[pos])


def test_decode_batch():
    rng = np.random.default_rng(1)
    hm = rng.normal(size=(2, 16, 16, 5)).astype(np.float32)
    reg = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
    out = decode.decode_peaks_batch(jnp.asarray(hm), jnp.asarray(reg), 8)
    assert out.scores.shape == (2, 5, 8)
    one = decode.decode_peaks(jnp.asarray(hm[1]), jnp.asarray(reg[1]), 8)
    np.testing.assert_allclose(np.asarray(out.scores[1]), np.asarray(one.scores))
