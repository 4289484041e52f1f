"""Numerics debugging.  [SURVEY.md §5 "Race detection / sanitizers"]

Pure-functional JAX has no data races to detect; the failure modes that
matter are NaN/Inf propagation and out-of-bounds gathers.  Tools:
  * `enable_nan_debugging()` — flip `jax_debug_nans` (+ optionally disable
    jit) so the failing primitive is reported at the op that produced it.
  * `checked(fn)` — wrap an op in `checkify` so index/NaN errors surface as
    structured errors inside jit (used by the op test-suite).
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def enable_nan_debugging(disable_jit: bool = False) -> None:
    jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def checked(fn, errors=checkify.index_checks | checkify.nan_checks):
    """Returns g(*args) -> (error, out); call error.throw() to raise."""
    return checkify.checkify(fn, errors=errors)
