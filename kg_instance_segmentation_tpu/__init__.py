"""Alias package: `kg_instance_segmentation_tpu` re-exports `kgtpu`.

The framework's import name is the short `kgtpu`; this alias provides the
fully-spelled package name so either import works:

    import kg_instance_segmentation_tpu as kgtpu
    from kg_instance_segmentation_tpu import models, ops, infer
    from kg_instance_segmentation_tpu.predictor import Predictor

Every kgtpu submodule is imported eagerly and mirrored into sys.modules, so
`import kg_instance_segmentation_tpu.X` always resolves to the SAME module
object as `import kgtpu.X` (lazy aliasing would let the alias path re-import
a duplicate module — duplicate classes, duplicate jit caches).
"""

from __future__ import annotations

import importlib as _importlib
import pkgutil as _pkgutil
import sys as _sys

import kgtpu as _kgtpu
from kgtpu import *  # noqa: F401,F403

__version__ = _kgtpu.__version__

# eagerly import the full kgtpu tree, then mirror it under this name
for _info in _pkgutil.walk_packages(_kgtpu.__path__, prefix="kgtpu."):
    try:
        _importlib.import_module(_info.name)
    except ImportError:
        pass  # optional deps of a submodule missing — skip its alias too

for _name in [n for n in _sys.modules if n.startswith("kgtpu.")]:
    _sys.modules["kg_instance_segmentation_tpu" + _name[len("kgtpu"):]] = (
        _sys.modules[_name])

# convenience attribute access (kg_instance_segmentation_tpu.models etc.)
from kgtpu import (  # noqa: F401,E402
    checkpoint,
    config,
    data,
    evaluate,
    export,
    infer,
    losses,
    models,
    ops,
    parallel,
    predictor,
    train_lib,
    utils,
    visualize,
)
