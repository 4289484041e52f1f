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


def test_checked_group_and_paste_clean():
    """The grouper and paste under checkify: no OOB gathers / NaNs even on
    adversarial random peaks and degenerate boxes."""
    from kgtpu.config import GroupConfig
    from kgtpu.ops.decode import Peaks
    from kgtpu.ops.group import group_keypoints
    from kgtpu.ops.roi import paste_masks

    rng = np.random.default_rng(1)
    k = 16
    peaks = Peaks(
        scores=jnp.asarray(rng.uniform(0, 1, (5, k)), jnp.float32),
        coords=jnp.asarray(rng.uniform(-2, 34, (5, k, 2)), jnp.float32),
        indices=jnp.zeros((5, k), jnp.int32))
    cfg = GroupConfig(max_peaks_per_class=k, max_detections=8)
    err, dets = jax.jit(checked(lambda p: group_keypoints(p, cfg)))(peaks)
    err.throw()

    masks = jnp.asarray(rng.uniform(0, 1, (8, 8, 8)), jnp.float32)
    boxes = jnp.asarray(
        np.concatenate([rng.uniform(-4, 30, (7, 4)),
                        [[5.0, 5.0, 5.0, 5.0]]]), jnp.float32)  # degenerate
    err2, _ = jax.jit(checked(
        lambda m, b: paste_masks(m, b, jnp.ones(8), jnp.ones(8, bool),
                                 32, 32)))(masks, boxes)
    err2.throw()


def test_compilation_cache_round_trip(tmp_path, monkeypatch):
    """enable_compilation_cache points JAX's persistent executable cache at
    the resolved directory and a fresh jit writes an entry there."""
    from kgtpu.utils import enable_compilation_cache

    d = str(tmp_path / "jaxcache")
    old = jax.config.jax_compilation_cache_dir
    old_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_min_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        assert enable_compilation_cache(d) == d
        assert jax.config.jax_compilation_cache_dir == d
        # small CPU programs compile under the 0.5 s production floor;
        # drop it so this test observes an actual write
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        n = np.random.default_rng(2).integers(64, 128)  # unseen-shape program
        jax.jit(lambda a: a @ a)(jnp.ones((int(n), int(n)))).block_until_ready()
        assert os.listdir(d), "no cache entry written"
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_min_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          old_min_bytes)

    # env-var opt-out and unwritable paths both disable instead of failing
    monkeypatch.setenv("KGTPU_COMPILE_CACHE", "off")
    assert enable_compilation_cache() is None
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("")
    assert enable_compilation_cache(str(blocker / "sub")) is None


def test_host_rss_and_limits():
    from kgtpu.utils.host import default_rss_limit_gb, host_rss_gb
    rss = host_rss_gb()
    assert 0.01 < rss < 200          # a live python process, not a typo
    lim = default_rss_limit_gb()
    assert lim == 0.0 or lim > rss   # auto limit must sit above current use


def test_restart_argv_rewrites_resume():
    from kgtpu.utils.host import restart_argv
    # fresh run -> bare --resume appended
    assert restart_argv(["train.py", "--num_epochs", "5"]) == [
        "train.py", "--num_epochs", "5", "--resume"]
    # explicit path rewritten to bare (latest supersedes the original src)
    assert restart_argv(["train.py", "--resume", "/old/ckpt", "-x"]) == [
        "train.py", "-x", "--resume"]
    assert restart_argv(["train.py", "--resume=/old/ckpt"]) == [
        "train.py", "--resume"]
    # bare --resume followed by another flag keeps that flag
    assert restart_argv(["train.py", "--resume", "--seed", "3"]) == [
        "train.py", "--seed", "3", "--resume"]
