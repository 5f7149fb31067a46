"""ILU / IC preconditioners.

Reference parity: ILU(p) / IC / ILUT / ItILU0 preconditioners
(src/solvers/preconditioners/preconditioner.cpp, alg enum
preconditioner.hpp:250-273): Build runs the factorization via LocalMatrix
ops, apply runs LUSolve / LLSolve.

TPU-native: factorization is host-side setup (ops/factorize); the apply is
either exact level-scheduled scans (`method="levels"`, analog
TriSolverAlg_Default) or fixed Jacobi sweeps on the factors
(`method="jacobi"`, analog TriSolverAlg_Iterative / ItILU0,
solver.hpp:72-76) — the iterative mode has no level serialization at all and
is the fastest on very parallel hardware, exactly why the reference grew
csritsv/ItILU0.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from ..formats import CSR, to_csr
from ..ops.factorize import ic0, ilu0, ilup, ilut
from ..ops.trisolve import (build_schedule, prepare_offd, solve_schedule,
                            trisolve_jacobi)


def _lu_apply(L: CSR, U: CSR, method: str, sweeps: int):
    if method == "levels":
        ls = build_schedule(L, unit_diag=True)
        us = build_schedule(U)

        def apply(r):
            return solve_schedule(us, solve_schedule(ls, r))
    elif method == "jacobi":
        # csritsv-analysis analog, run NOW (setup phase): the sweep SpMV's
        # off-diagonal operand + its WJD fast path must exist before the
        # apply closure is traced inside a solver body
        prepare_offd(L)
        prepare_offd(U)

        def apply(r):
            y = trisolve_jacobi(L, r, sweeps=sweeps, unit_diag=True)
            return trisolve_jacobi(U, y, sweeps=sweeps)
    else:
        raise ValueError(f"unknown tri-solve method {method!r}")
    return apply


def ilu(A, p: int = 0, *, method: str = "levels", sweeps: int = 8):
    """ILU(p) preconditioner closure r -> (LU)^{-1} r (reference: ILU
    preconditioner with SetLevel(p))."""
    csr = A if isinstance(A, CSR) else to_csr(A)
    L, U = ilu0(csr) if p == 0 else ilup(csr, p)
    return _lu_apply(L, U, method, sweeps)


def ilut_precond(A, tol: float = 1e-3, max_fill: int = 32, *,
                 method: str = "levels", sweeps: int = 8):
    """ILUT(t, m) preconditioner (reference: ILUT preconditioner)."""
    csr = A if isinstance(A, CSR) else to_csr(A)
    L, U = ilut(csr, tol, max_fill)
    return _lu_apply(L, U, method, sweeps)


def ic(A, *, method: str = "levels", sweeps: int = 8):
    """IC(0) preconditioner: z = L^{-T} L^{-1} r (reference: IC
    preconditioner, LLSolve path)."""
    csr = A if isinstance(A, CSR) else to_csr(A)
    L = ic0(csr)
    Lt = L.transpose_host()
    if method == "levels":
        ls = build_schedule(L)
        us = build_schedule(Lt)

        def apply(r):
            return solve_schedule(us, solve_schedule(ls, r))
    else:
        prepare_offd(L)
        prepare_offd(Lt)

        def apply(r):
            y = trisolve_jacobi(L, r, sweeps=sweeps)
            return trisolve_jacobi(Lt, y, sweeps=sweeps)
    return apply


def itilu0(A, sweeps: int = 8):
    """ItILU0: ILU(0) factors applied with fixed iterative sweeps
    (reference: ItILU0 preconditioner / rocsparse csritilu0)."""
    return ilu(A, 0, method="jacobi", sweeps=sweeps)
