"""Auxiliary subsystems: tracing/profiling + numerics debugging.  [SURVEY.md §5]"""

from kgtpu.utils.profiling import cost_analysis, trace
from kgtpu.utils.debug import enable_nan_debugging, checked
from kgtpu.utils.cache import enable_compilation_cache

__all__ = ["cost_analysis", "trace", "enable_nan_debugging", "checked",
           "enable_compilation_cache"]
