"""Persistent XLA compilation cache for the CLI entry points.  [SURVEY.md §5
runtime/serving; DESIGN.md "real hardware" — first compiles on the tunneled
TPU cost 20-40 s per program and dominate short CLI runs]

JAX already ships a content-addressed executable cache keyed by the HLO
hash (identical program + flags + backend -> identical entry), so enabling
it is purely a latency feature: numerics and determinism are unaffected.
The reference has no analogue because torch eager pays no compile step;
for a jit-everything framework the cache IS the reference-parity "second
run starts instantly" behavior.

Resolution order for the directory: explicit argument > ``KGTPU_COMPILE_CACHE``
environment variable > ``~/.cache/kgtpu/jax``.  Setting the env var to
one of ``""/"0"/"off"/"none"`` disables the cache entirely.
"""

from __future__ import annotations

import logging
import os

DEFAULT_DIR = os.path.join("~", ".cache", "kgtpu", "jax")
_DISABLED = ("", "0", "off", "none")

log = logging.getLogger("kgtpu.cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory in use, or None when disabled (by env var or an
    unwritable path — CLI runs must never fail because a cache can't be
    created, e.g. a read-only $HOME in a serving container).
    """
    if cache_dir is None:
        cache_dir = os.environ.get("KGTPU_COMPILE_CACHE", DEFAULT_DIR)
        # the disable sentinels apply to the env-var path only — an explicit
        # argument is taken literally (the documented contract)
        if cache_dir.strip().lower() in _DISABLED:
            return None
    cache_dir = os.path.expanduser(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        if not os.access(cache_dir, os.W_OK):
            raise OSError("directory not writable")
    except OSError as e:
        log.warning("compilation cache disabled: cannot create %s (%s)",
                    cache_dir, e)
        return None

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache even fast compiles: the tunneled-TPU dispatch makes every
    # first compile expensive relative to a disk read, and the entries
    # for this model family are small.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
