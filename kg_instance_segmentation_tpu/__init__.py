"""Alias package: `kg_instance_segmentation_tpu` re-exports `kgtpu`.

The framework's import name is the short `kgtpu`; this alias provides the
fully-spelled package name so either import works:

    import kg_instance_segmentation_tpu as kgtpu
    from kg_instance_segmentation_tpu import models, ops, infer
"""

import sys as _sys

import kgtpu as _kgtpu
from kgtpu import *  # noqa: F401,F403
from kgtpu import (  # noqa: F401
    checkpoint,
    config,
    data,
    evaluate,
    infer,
    losses,
    models,
    ops,
    parallel,
    train_lib,
    utils,
)

__version__ = _kgtpu.__version__

# submodule aliases so `kg_instance_segmentation_tpu.ops.decode` etc. resolve
for _name, _mod in list(_sys.modules.items()):
    if _name.startswith("kgtpu"):
        _sys.modules["kg_instance_segmentation_tpu" + _name[len("kgtpu"):]] = _mod
