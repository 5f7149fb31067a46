"""FGMRES sample (reference: clients/samples/fgmres.cpp): flexible GMRES
whose preconditioner is itself an iterative solver (CG sweeps)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import jax.numpy as jnp
import numpy as np

import rocalution_tpu as rt

A = rt.convection_diffusion_2d(48)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))

# "any solver preconditions any solver" (reference README.md:76-80):
# the preconditioner is itself an iterative solver — 4 Jacobi-smoothed
# fixed-point sweeps on A z = r
inv_d = rt.jacobi(A)
M = lambda r: rt.fixed_point_sweeps(A, r, jnp.zeros_like(r),
                                    M=inv_d, sweeps=4, omega=0.8)
x, info = rt.fgmres(A, b, M=M, basis_size=30, rel_tol=1e-8, max_iter=2000)
print(f"fgmres(30)+jacobi-sweeps: iters={int(info.iterations)} "
      f"status={int(info.status)} err={np.linalg.norm(np.asarray(x)-1):.2e}")
