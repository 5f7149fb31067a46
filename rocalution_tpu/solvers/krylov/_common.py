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
    allreduce: Callable  # identity locally; psum over the mesh axis globally


def make_reductions(axis_name: Optional[str]) -> ReductionOps:
    if axis_name is None:
        return ReductionOps(
            blas1.dot, blas1.dot_nonconj, blas1.norm, blas1.reduce_sum,
            lambda v: v,
        )

    def pdot(x, y):
        return jax.lax.psum(jnp.vdot(x, y), axis_name)

    def pdot_nc(x, y):
        return jax.lax.psum(jnp.sum(x * y), axis_name)

    def pnorm(x):
        return jnp.sqrt(jax.lax.psum(jnp.real(jnp.vdot(x, x)), axis_name))

    def psum(x):
        return jax.lax.psum(jnp.sum(x), axis_name)

    def allreduce(v):
        return jax.lax.psum(v, axis_name)

    return ReductionOps(pdot, pdot_nc, pnorm, psum, allreduce)


def select_tree(pred, on_true, on_false):
    """Elementwise tree select — used for mid-iteration convergence guards
    (e.g. BiCGStab's half-step exit) without breaking `lax.while_loop`."""
    return jax.tree.map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


def guarded_check(ctrl, state, res):
    """check_residual only while running — lets solvers with several checks
    per outer cycle (BiCGStab(l), IDR(s)) freeze the state after the first
    criterion hit without leaving the `lax.while_loop` mid-body."""
    new = ctrl.check_residual(state, res)
    return select_tree(state.running, new, state)


def safe_div(num, den):
    """num/den with 0/0 -> 0 (guards terminal-iteration breakdowns that would
    otherwise poison a masked lane with NaN)."""
    zero = den == 0
    return jnp.where(zero, 0.0, num / jnp.where(zero, 1.0, den))


def identity_precond(r):
    return r


def prepare(A, b, x0, M, ctrl: Optional[IterationControl], kwargs) -> Tuple:
    """Normalize solver inputs: operator closure, rhs, initial guess,
    preconditioner closure, iteration control, reduction ops."""
    from ...utils.log import log_debug

    axis_name = kwargs.pop("axis_name", None)
    log_debug(A, "solve", getattr(b, "shape", None), axis_name, kwargs)
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
