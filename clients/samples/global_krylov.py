"""Distributed Krylov family with BlockJacobi + local sub-preconditioners.

Covers the reference's remaining preconditioned MPI samples in one driver
(each was one solver x one local preconditioner on the rank's diagonal
block via BlockJacobi, preconditioner_blockjacobi.hpp):

* bicgstab_mpi.cpp  -> BiCGStab + BlockJacobi(ILU0)  (reference used MCGS)
* fcg_mpi.cpp       -> FCG      + BlockJacobi(ILU0)
* fgmres_mpi.cpp    -> FGMRES   + BlockJacobi(SPAI)
* idr_mpi.cpp       -> IDR(4)   + BlockJacobi(FSAI)
* qmrcgstab_mpi.cpp -> QMRCGStab+ BlockJacobi(ILUT)

Runs on however many devices are present; to emulate a multi-chip mesh on
CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8 (+ cpu platform).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import jax
import rocalution_tpu as rt
from rocalution_tpu.parallel import (block_jacobi_precond, dist_solve,
                                     distribute_csr, make_mesh)

nparts = min(8, len(jax.devices()))
print(f"devices: {len(jax.devices())} -> {nparts} partitions")

A = rt.laplacian_2d(48)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
Ag = distribute_csr(A, nparts)
mesh = make_mesh(nparts)

RUNS = [
    ("bicgstab + BJ(ilu0)", rt.bicgstab, "ilu0", {}),
    ("fcg       + BJ(ilu0)", rt.fcg, "ilu0", {}),
    ("fgmres    + BJ(spai)", rt.fgmres, "spai", {}),
    ("idr(4)    + BJ(fsai)", rt.idr, "fsai", {"shadow_space": 4}),
    ("qmrcgstab + BJ(ilut)", rt.qmrcgstab, "ilut", {}),
]

for name, solver, kind, kw in RUNS:
    M = block_jacobi_precond(Ag, kind)
    x, info = dist_solve(solver, Ag, b, M=M, mesh=mesh, rel_tol=1e-8,
                         max_iter=2000, **kw)
    err = np.linalg.norm(np.asarray(x) - 1.0)
    print(f"{name}: iters={int(info.iterations)} "
          f"status={int(info.status)} err={err:.2e}")
