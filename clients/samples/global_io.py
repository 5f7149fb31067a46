"""Distributed IO sample (reference: clients/samples/global-io_mpi.cpp):
write the per-rank triad (matrix shards + ParallelManager descriptor),
read it back, and solve distributed.

Run on CPU mesh: JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 python ...
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import jax

import rocalution_tpu as rt
from rocalution_tpu.io import read_global_csr, write_global_csr
from rocalution_tpu.parallel import dist_solve, distribute_csr, make_mesh

nparts = min(4, len(jax.devices()))
A = rt.laplacian_2d(48)
Ag = distribute_csr(A, nparts)
prefix = os.path.join(tempfile.mkdtemp(), "lap48")
write_global_csr(prefix, Ag)
print("wrote triad:", prefix + ".{pm.json,matrix.rank.N,pm.rank.N}")

Ag2 = read_global_csr(prefix)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
x, info = dist_solve(rt.cg, Ag2, b, mesh=make_mesh(nparts),
                     rel_tol=1e-8, max_iter=2000)
print(f"dist cg on read-back matrix: iters={int(info.iterations)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
