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
    """Inner products/norms, optionally mesh-global. `res_norm` is the
    CONVERGENCE-CHECK norm selected by the user (L1/L2/L∞ — the analog of
    IterativeLinearSolver::SetResidualNorm + Norm_, solver.hpp:386,
    solver.cpp:433-469); algorithmic norms (Arnoldi, Givens recurrences)
    always use `norm` (L2), exactly as the reference does."""

    dot: Callable
    dot_nonconj: Callable
    norm: Callable
    sum: Callable
    allreduce: Callable  # identity locally; psum over the mesh axis globally
    res_norm: Callable = blas1.norm


def make_reductions(axis_name: Optional[str],
                    res_norm_type: int = 2) -> ReductionOps:
    if res_norm_type not in (1, 2, 3):
        raise ValueError(
            f"res_norm must be 1 (L1), 2 (L2) or 3 (L-infinity), got "
            f"{res_norm_type!r}")
    if axis_name is None:
        local = {1: blas1.asum, 2: blas1.norm,
                 3: lambda x: jnp.max(jnp.abs(x))}   # blas1.amax returns
                                                     # (index, value)
        return ReductionOps(
            blas1.dot, blas1.dot_nonconj, blas1.norm, blas1.reduce_sum,
            lambda v: v, local[res_norm_type],
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

    def pasum(x):
        return jax.lax.psum(jnp.sum(jnp.abs(x)), axis_name)

    def pamax(x):
        return jax.lax.pmax(jnp.max(jnp.abs(x)), axis_name)

    pres = {1: pasum, 2: pnorm, 3: pamax}[res_norm_type]
    return ReductionOps(pdot, pdot_nc, pnorm, psum, allreduce, pres)


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
    # SetResidualNorm analog: 1=L1, 2=L2 (default), 3=L-infinity — applies
    # to convergence checks only (solver.cpp:433-469)
    res_norm_type = int(kwargs.pop("res_norm", 2))
    log_debug(A, "solve", getattr(b, "shape", None), axis_name, kwargs)
    op = as_operator(A)
    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    precond = identity_precond if M is None else as_operator(M)
    if ctrl is None:
        ctrl = IterationControl(**kwargs)
    elif kwargs:
        raise ValueError("pass either ctrl= or tolerance kwargs, not both")
    red = make_reductions(axis_name, res_norm_type)
    return op, b, x, precond, ctrl, red


def real_dtype(dtype):
    return jnp.zeros((), dtype).real.dtype
