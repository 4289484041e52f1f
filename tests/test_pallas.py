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


def test_target_renderer_flag_loss_parity():
    """cfg.train.target_renderer='pallas' yields the same loss + metrics as
    the scan renderer (interpret mode on CPU) — the flag swaps renderers,
    nothing else."""
    import dataclasses

    from kgtpu import train_lib
    from kgtpu.config import tiny_test_config
    from kgtpu.data import build_dataset, make_batch
    from kgtpu.models import KGNet

    cfg = tiny_test_config()
    state = train_lib.create_train_state(cfg, jax.random.PRNGKey(0))
    model = KGNet(cfg=cfg.model)
    ds = build_dataset(cfg.data)
    batch = make_batch(ds, [0, 1], cfg.data, augment=False,
                       rng=np.random.default_rng(0))
    rng = jax.random.PRNGKey(7)

    losses = {}
    for renderer in ("scan", "pallas"):
        rcfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, target_renderer=renderer))
        loss, _ = train_lib.loss_fn(state.params, batch, rng, model, rcfg,
                                    state.batch_stats)
        losses[renderer] = float(loss)
    np.testing.assert_allclose(losses["pallas"], losses["scan"], rtol=1e-5)


def test_mesh_forces_scan_renderer():
    import dataclasses

    from kgtpu.config import tiny_test_config
    from kgtpu.train_lib import _mesh_safe

    cfg = tiny_test_config()
    pcfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, target_renderer="pallas"))
    assert _mesh_safe(pcfg, None).train.target_renderer == "pallas"
    assert _mesh_safe(pcfg, object()).train.target_renderer == "scan"


@pytest.mark.tpu
def test_pallas_gaussian_tpu_parity():
    kpts, sizes, valid, h, w = _scene(seed=3, n=128, n_valid=100)
    want = np.asarray(jax.jit(
        lambda k, s, v: tops.render_heatmaps(k, s, v, h, w))(kpts, sizes, valid))
    got = np.asarray(jax.jit(
        lambda k, s, v: render_heatmaps_pallas(k, s, v, h, w))(kpts, sizes, valid))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# fused GroupNorm(+ReLU)


def _gn_oracle(x, scale, bias, groups, relu, eps=1e-6):
    """flax-parity NumPy oracle: stats in f32 over (H, W, C/G) per sample."""
    b, h, w, c = x.shape
    xf = np.asarray(x, np.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    y = (xf - mean) / np.sqrt(var + eps)
    y = y.reshape(b, h, w, c) * np.asarray(scale) + np.asarray(bias)
    if relu:
        y = np.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("shape,groups", [((2, 16, 16, 128), 32),
                                          ((1, 8, 8, 64), 32),
                                          ((3, 4, 4, 128), 16)])
def test_fused_group_norm_interpret_parity(shape, groups, relu):
    from kgtpu.ops.pallas.groupnorm import fused_group_norm
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.2, size=shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.5, size=shape[-1]).astype(np.float32))
    got = np.asarray(fused_group_norm(x, scale, bias, groups, relu=relu,
                                      interpret=True))
    want = _gn_oracle(x, scale, bias, groups, relu)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_fused_group_norm_interpret_parity_bf16():
    from kgtpu.ops.pallas.groupnorm import fused_group_norm
    rng = np.random.default_rng(11)
    xf = rng.normal(0.0, 2.0, size=(2, 16, 16, 128)).astype(np.float32)
    x = jnp.asarray(xf).astype(jnp.bfloat16)
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)
    got = np.asarray(fused_group_norm(x, scale, bias, 32, relu=True,
                                      interpret=True)).astype(np.float32)
    want = _gn_oracle(np.asarray(x).astype(np.float32), scale, bias, 32, True)
    assert got.dtype == np.float32 and x.dtype == jnp.bfloat16
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_fused_norm_module_falls_back_on_cpu():
    """norm="group_fused" on a non-TPU backend must equal plain "group"
    bit-for-bit (same flax path, same param tree)."""
    import flax
    from kgtpu.models.blocks import Norm
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)).astype(np.float32))
    plain = Norm("group")
    fused = Norm("group_fused")
    v1 = plain.init(jax.random.PRNGKey(0), x)
    v2 = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    np.testing.assert_array_equal(
        np.asarray(plain.apply(v1, x, relu=True)),
        np.asarray(fused.apply(v1, x, relu=True)))


def test_fused_norm_param_tree_matches_groupnorm():
    """The fused module must accept a checkpoint trained with flax
    GroupNorm unchanged: identical path GroupNorm_0/{scale,bias}."""
    from kgtpu.models.blocks import Norm
    x = jnp.zeros((1, 16, 16, 128), jnp.float32)
    v = Norm("group").init(jax.random.PRNGKey(0), x)
    leaves = {"/".join(p): l.shape for p, l in
              flatten_params(v["params"]).items()}
    assert leaves == {"GroupNorm_0/scale": (128,),
                      "GroupNorm_0/bias": (128,)}


def flatten_params(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.mark.tpu
def test_fused_group_norm_tpu_parity():
    from kgtpu.ops.pallas.groupnorm import fused_group_norm
    import flax.linen as nn
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(1.0, 2.0, size=(4, 128, 128, 128))
                    .astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.normal(1.0, 0.2, size=128).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.5, size=128).astype(np.float32))
    gn = nn.GroupNorm(num_groups=32, dtype=jnp.bfloat16)
    want = np.asarray(jax.jit(lambda x: nn.relu(gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x)))(x)).astype(np.float32)
    got = np.asarray(jax.jit(lambda x: fused_group_norm(
        x, scale, bias, 32, relu=True))(x)).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
