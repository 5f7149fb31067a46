"""Distributed CG over a device mesh (reference: clients/samples/cg_mpi.cpp).

Runs on however many devices are present; to emulate a multi-chip mesh on
CPU: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import jax
import rocalution_tpu as rt
from rocalution_tpu.parallel import (block_jacobi_diag, dist_solve,
                                     distribute_csr, make_mesh)

nparts = min(8, len(jax.devices()))
print(f"devices: {len(jax.devices())} -> {nparts} partitions")

A = rt.laplacian_2d(64)
x_true = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, x_true))

Ag = distribute_csr(A, nparts)
mesh = make_mesh(nparts)
M = block_jacobi_diag(Ag)
x, info = dist_solve(rt.cg, Ag, b, M=M, mesh=mesh, rel_tol=1e-8,
                     max_iter=2000)
print(f"distributed CG: iters={int(info.iterations)} "
      f"status={int(info.status)} err={np.linalg.norm(np.asarray(x)-1):.2e}")
