"""BiCGStab sample (reference: clients/samples/bicgstab.cpp):
nonsymmetric convection-diffusion system with ILU(0)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.convection_diffusion_2d(48)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
M = rt.precond.ilu(A, 0)
x, info = rt.bicgstab(A, b, M=M, rel_tol=1e-8, max_iter=2000)
print(f"bicgstab+ilu0: iters={int(info.iterations)} "
      f"status={int(info.status)} err={np.linalg.norm(np.asarray(x)-1):.2e}")
