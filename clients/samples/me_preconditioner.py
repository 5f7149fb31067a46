"""Multi-elimination ILU sample (reference: clients/samples/me-preconditioner.cpp)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.precond import multi_elimination

A = rt.laplacian_2d(40)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
M = multi_elimination(A, levels=3, drop_tol=1e-3)
x, info = rt.fgmres(A, b, M=M, rel_tol=1e-8, max_iter=2000)
print(f"FGMRES+ME(3): iters={int(info.iterations)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
