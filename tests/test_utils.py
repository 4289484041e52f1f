"""Profiling/debug utility tests (SURVEY.md §5 subsystems)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from kgtpu.utils import checked, cost_analysis, trace
from kgtpu.utils.profiling import summarize_cost
from kgtpu.ops.decode import decode_peaks


def test_cost_analysis_reports_flops():
    f = lambda a, b: jnp.dot(a, b)
    x = jnp.zeros((256, 256))
    ca = cost_analysis(f, x, x)
    # CPU backend reports flops; 2*256^3 for the matmul
    assert ca.get("flops", 0) >= 2 * 256 ** 3 * 0.9
    s = summarize_cost(f, x, x, name="matmul")
    assert "GFLOP" in s


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with trace(d):
        jnp.sum(jnp.ones((128, 128))).block_until_ready()
    files = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert files, "no trace files written"


def test_checked_decode_has_no_oob_or_nan():
    rng = np.random.default_rng(0)
    hm = jnp.asarray(rng.normal(size=(16, 16, 5)), jnp.float32)
    reg = jnp.asarray(rng.normal(size=(16, 16, 2)), jnp.float32)
    g = checked(lambda a, b: decode_peaks(a, b, 8))
    err, out = jax.jit(g)(hm, reg)
    err.throw()   # raises if any indexed gather was OOB or NaN appeared
    assert out.scores.shape == (5, 8)
