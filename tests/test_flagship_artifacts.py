"""Integrity gates for the committed flagship checkpoints.

The README quality tables cite `runs/kg_hard1024/model_99` (hourglass) and
`runs/kg_unet1024/model_99` (unet); round 3 lost its flagship artifact to a
workspace wipe, so these artifacts are now committed and these tests assert
they stay restorable: the orbax payload reads back, carries its
self-describing Config, the EMA params are finite and the right size, and a
small forward pass still produces sane head outputs.  A failure here means
the published numbers are no longer reproducible from the repo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgtpu import checkpoint
from kgtpu.infer import _vars
from kgtpu.models import KGNet

FLAGSHIPS = [
    # (checkpoint, backbone, param-count bounds) — counts from README
    # (hourglass 9.3M, unet 32.0M); bounds are loose so head tweaks in
    # either direction still identify the right architecture.
    ("runs/kg_hard1024/model_99", "hourglass", 8.0e6, 11.0e6),
    ("runs/kg_unet1024/model_99", "unet", 29.0e6, 35.0e6),
]


@pytest.mark.parametrize("path,backbone,lo,hi", FLAGSHIPS,
                         ids=[c[0].split("/")[1] for c in FLAGSHIPS])
def test_flagship_checkpoint_restores_and_runs(path, backbone, lo, hi):
    params, extra = checkpoint.restore_bundle(path, use_ema=True)
    stored = checkpoint.decode_config(extra)
    assert stored is not None, f"{path} lost its self-describing Config"
    assert stored.model.backbone == backbone

    leaves = jax.tree.leaves(params)
    n_params = sum(int(np.asarray(x).size) for x in leaves)
    assert lo < n_params < hi, (path, n_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves), \
        f"{path}: non-finite EMA params"

    # smallest valid input (sides must divide by 64 for both backbones);
    # asserts the params tree still matches the architecture and the
    # trained hm bias keeps background logits low (sigmoid < 0.5).
    model = KGNet(cfg=stored.model)
    out = model.apply(_vars(params), jnp.zeros((1, 128, 128, 3)))
    hm = out["stacks"][-1]["hm"]
    assert hm.shape == (1, 32, 32, stored.model.num_kp_classes)
    assert np.isfinite(np.asarray(hm)).all()
    assert float(np.median(np.asarray(hm))) < 0.0
