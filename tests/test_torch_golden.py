"""Golden-parity tests against torch-CPU reference implementations
(SURVEY.md §4: "tiny NumPy/torch reference versions ... assert the JAX ops
match").  torch here is an independent oracle, never a dependency of the
framework itself."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from kgtpu import losses
from kgtpu.ops.decode import _maxpool_nms
from kgtpu.ops.roi import crop_and_resize


def test_maxpool_nms_matches_torch_maxpool():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(32, 40, 5)).astype(np.float32)
    got = np.asarray(_maxpool_nms(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(2, 0, 1)[None]
    pooled = F.max_pool2d(t, 3, stride=1, padding=1)[0].permute(1, 2, 0).numpy()
    want = np.where(x == pooled, x, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crop_matches_torch_interpolate_fullframe():
    """Full-image crop == F.interpolate(align_corners=False) — both are the
    half-pixel convention (OPEN-10)."""
    rng = np.random.default_rng(1)
    img = rng.normal(size=(24, 24, 3)).astype(np.float32)
    r = 48  # upsample so edge-clamp regions match between the two impls
    got = np.asarray(crop_and_resize(
        jnp.asarray(img), jnp.asarray([[0.0, 0.0, 24.0, 24.0]]), r))[0]
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = F.interpolate(t, size=(r, r), mode="bilinear",
                         align_corners=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_focal_loss_matches_torch_reference():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, 16, 5)).astype(np.float32)
    t = np.clip(rng.uniform(0, 1.15, (16, 16, 5)), 0, 1).astype(np.float32)
    t[t > 0.9] = 1.0

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(t)
    p = torch.sigmoid(lt)
    pos = (tt >= 1.0).float()
    pos_l = -((1 - p) ** 2) * F.logsigmoid(lt) * pos
    neg_l = -((1 - tt) ** 4) * (p ** 2) * F.logsigmoid(-lt) * (1 - pos)
    want = float((pos_l.sum() + neg_l.sum()) / pos.sum().clamp(min=1))

    got = float(losses.focal_loss(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_dice_mask_loss_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(3, 8, 8)).astype(np.float32)
    t = (rng.uniform(size=(3, 8, 8)) > 0.5).astype(np.float32)
    valid = np.asarray([1.0, 1.0, 0.0], np.float32)

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(t)
    bce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    bce = bce.mean(dim=(1, 2))
    p = torch.sigmoid(lt)
    inter = (p * tt).sum(dim=(1, 2))
    dice = 1 - (2 * inter + 1) / (p.sum(dim=(1, 2)) + tt.sum(dim=(1, 2)) + 1)
    per = bce + dice
    want = float((per * torch.from_numpy(valid)).sum() / valid.sum())

    got = float(losses.mask_loss(jnp.asarray(logits), jnp.asarray(t),
                                 jnp.asarray(valid)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
