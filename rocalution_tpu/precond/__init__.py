"""Preconditioner stack (reference: src/solvers/preconditioners/*).

Every preconditioner is a closure ``r -> z`` built once from the matrix
(setup = reference Build(), host-side; apply = on-device). Any solver can be
a preconditioner of any other by passing its closure as ``M``.
"""

from . import jacobi as _jacobi_mod
from .gs import backward_gs, gs, sgs, sor, ssor
from .ilu import ic, ilu, ilut_precond, itilu0
from .jacobi import jacobi
from .multicolored import multicolored_gs, multicolored_ilu, multicolored_sgs

__all__ = [
    "backward_gs", "gs", "ic", "ilu", "ilut_precond", "itilu0", "jacobi",
    "multicolored_gs", "multicolored_ilu", "multicolored_sgs", "sgs", "sor",
    "ssor",
]
