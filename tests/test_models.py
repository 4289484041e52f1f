"""Shape/jit tests for the model zoo (C5-C7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgtpu.config import ModelConfig
from kgtpu.models import KGNet


def _tiny(backbone):
    return ModelConfig(backbone=backbone, num_stacks=2, base_channels=16,
                       hg_depth=2, head_channels=16, roi_size=4, mask_size=8,
                       mask_channels=8, compute_dtype="float32")


@pytest.mark.parametrize("backbone,nstacks", [("hourglass", 2),
                                              ("hourglass_fast", 2),
                                              ("resnet_fpn", 1),
                                              ("unet", 1)])
def test_forward_shapes(backbone, nstacks):
    cfg = _tiny(backbone)
    model = KGNet(cfg=cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert len(out["stacks"]) == nstacks
    for st in out["stacks"]:
        assert st["hm"].shape == (2, 16, 16, 5)
        assert st["reg"].shape == (2, 16, 16, 2)
        assert st["hm"].dtype == jnp.float32
    assert out["feat"].shape[:3] == (2, 16, 16)


def test_wh_head_optional():
    cfg = dataclasses.replace(_tiny("hourglass"), use_wh_head=True, num_stacks=1)
    model = KGNet(cfg=cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    out = model.apply(variables, x)
    assert out["stacks"][0]["wh"].shape == (1, 8, 8, 2)


def test_mask_logits_shape():
    cfg = _tiny("hourglass")
    model = KGNet(cfg=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    feat = model.apply(variables, x)["feat"][0]
    boxes = jnp.asarray([[1.0, 1.0, 9.0, 9.0], [2.0, 2.0, 6.0, 12.0]])
    logits = model.apply(variables, feat, boxes, method=KGNet.mask_logits)
    assert logits.shape == (2, 8, 8)       # mask_size = 2 * roi_size
    assert logits.dtype == jnp.float32


def test_bfloat16_compute_float32_out():
    cfg = dataclasses.replace(_tiny("hourglass"), compute_dtype="bfloat16",
                              num_stacks=1)
    model = KGNet(cfg=cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    out = model.apply(variables, x)
    assert out["stacks"][0]["hm"].dtype == jnp.float32
    # params stay f32
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_hm_bias_prior():
    """hm head bias starts at -2.19 so sigmoid ≈ 0.1 foreground prior."""
    cfg = _tiny("hourglass")
    model = KGNet(cfg=cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    out = model.apply(variables, x)
    mean_p = float(jax.nn.sigmoid(out["stacks"][-1]["hm"]).mean())
    assert 0.02 < mean_p < 0.35


def test_inter_inject_prediction_feedback():
    """inter_inject re-injects stack-i head logits into stack i+1: outputs
    keep their shapes, and the injection conv exists ONLY in this mode."""
    mcfg = dataclasses.replace(_tiny("hourglass"), inter_inject=True)
    model = KGNet(cfg=mcfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    paths = {jax.tree_util.keystr(p) for p, _ in flat}
    assert any("inject_0" in p for p in paths), sorted(paths)[:10]

    out = model.apply(variables, x)
    assert len(out["stacks"]) == 2
    assert out["stacks"][1]["hm"].shape == (1, 16, 16, 5)
    assert out["feat"].shape[-1] == mcfg.base_channels

    # plain two-stack model: no injection params
    model0 = KGNet(cfg=_tiny("hourglass"))
    v0 = model0.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
    paths0 = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_flatten_with_path(v0)[0]}
    assert not any("inject" in p for p in paths0)


def test_hourglass_fast_drops_top_skip_params():
    """hourglass_fast must be the same tree as hourglass minus the top-level
    skip Residuals (the identity-skip variant exists to cut the two most
    expensive convs per hourglass, not to change anything else)."""
    x = jnp.zeros((1, 32, 32, 3))

    def leaves(backbone):
        m = KGNet(cfg=_tiny(backbone))
        v = m.init(jax.random.PRNGKey(0), x, method=KGNet.init_all)
        return {jax.tree_util.keystr(k): np.shape(val) for k, val in
                jax.tree_util.tree_flatten_with_path(v["params"])[0]}

    full, fast = leaves("hourglass"), leaves("hourglass_fast")
    missing = set(full) - set(fast)
    assert not set(fast) - set(full)                 # fast adds nothing
    assert missing                                   # and removes something
    # everything removed is a top-level (non-recursed) skip Residual:
    # under HourglassModule_<i> but not under a nested HourglassModule_0
    for k in missing:
        tail = k.split("HourglassModule_", 2)[-1]
        assert "HourglassModule_" not in tail, k
