"""Shared helpers for Krylov solvers.

Global (distributed) support mirrors the reference's design where every
solver is instantiated for both Local and Global operators
(e.g. cg.cpp:448-477): here a solver becomes distributed simply by being
called inside `shard_map` with `axis_name=...` — reductions turn into `psum`
over the mesh (the analog of MPI_Allreduce in global_vector.cpp:547-556) and
the operator closure carries the halo exchange.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops import blas1
from ...ops.spmv import as_operator
from ..iter_ctrl import IterationControl


class ReductionOps(NamedTuple):
    """Inner products/norms, optionally mesh-global."""

    dot: Callable
    dot_nonconj: Callable
    norm: Callable
    sum: Callable


def make_reductions(axis_name: Optional[str]) -> ReductionOps:
    if axis_name is None:
        return ReductionOps(
            blas1.dot, blas1.dot_nonconj, blas1.norm, blas1.reduce_sum
        )

    def pdot(x, y):
        return jax.lax.psum(jnp.vdot(x, y), axis_name)

    def pdot_nc(x, y):
        return jax.lax.psum(jnp.sum(x * y), axis_name)

    def pnorm(x):
        return jnp.sqrt(jax.lax.psum(jnp.real(jnp.vdot(x, x)), axis_name))

    def psum(x):
        return jax.lax.psum(jnp.sum(x), axis_name)

    return ReductionOps(pdot, pdot_nc, pnorm, psum)


def identity_precond(r):
    return r


def prepare(A, b, x0, M, ctrl: Optional[IterationControl], kwargs) -> Tuple:
    """Normalize solver inputs: operator closure, rhs, initial guess,
    preconditioner closure, iteration control, reduction ops."""
    axis_name = kwargs.pop("axis_name", None)
    op = as_operator(A)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    precond = identity_precond if M is None else as_operator(M)
    if ctrl is None:
        ctrl = IterationControl(**kwargs)
    elif kwargs:
        raise ValueError("pass either ctrl= or tolerance kwargs, not both")
    red = make_reductions(axis_name)
    return op, b, x, precond, ctrl, red


def real_dtype(dtype):
    return jnp.zeros((), dtype).real.dtype
