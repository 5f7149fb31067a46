"""Runtime utilities: logging, validation, generators, key, profiling."""

from . import generators, key, log, profile, validate  # noqa: F401
from .hoist import hoisted_jit  # noqa: F401
