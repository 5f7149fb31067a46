"""Shared helpers for Krylov solvers."""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from ...ops.spmv import as_operator
from ..iter_ctrl import IterationControl


def identity_precond(r):
    return r


def prepare(A, b, x0, M, ctrl: Optional[IterationControl], kwargs) -> Tuple:
    """Normalize solver inputs: operator closure, initial guess, preconditioner
    closure, iteration control."""
    op = as_operator(A)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    precond = identity_precond if M is None else as_operator(M)
    if ctrl is None:
        ctrl = IterationControl(**kwargs)
    elif kwargs:
        raise ValueError("pass either ctrl= or tolerance kwargs, not both")
    return op, b, x, precond, ctrl


def real_dtype(dtype):
    return jnp.zeros((), dtype).real.dtype
