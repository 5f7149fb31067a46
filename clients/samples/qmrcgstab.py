"""QMRCGStab solve (reference: clients/samples/qmrcgstab_mpi.cpp — the MPI
variant collapsed into this sample; pass --dist to run it sharded over an
8-device virtual mesh)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.convection_diffusion_2d(64)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))

if "--dist" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rocalution_tpu.parallel import (block_jacobi_diag, dist_solve,
                                         distribute_csr)

    nparts = min(8, len(jax.devices()))
    Ag = distribute_csr(A, nparts)
    x, info = dist_solve(rt.qmrcgstab, Ag, b, M=block_jacobi_diag(Ag),
                         rel_tol=1e-8, max_iter=2000)
    tag = f"qmrcgstab[dist x{nparts}]"
else:
    x, info = rt.qmrcgstab(A, b, M=rt.jacobi(A), rel_tol=1e-8, max_iter=2000)
    tag = "qmrcgstab"
print(f"{tag}: iters={int(info.iterations)} status={int(info.status)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
