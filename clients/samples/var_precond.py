"""Variable preconditioner sample (reference: clients/samples/var-precond.cpp)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.precond import jacobi, sgs, tns, variable_precond

A = rt.laplacian_2d(40)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
M = variable_precond([jacobi(A), sgs(A), tns(A)])
x, info = rt.fgmres(A, b, M=M, rel_tol=1e-8, max_iter=2000)
print(f"FGMRES+VariablePrecond: iters={int(info.iterations)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
