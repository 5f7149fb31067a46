"""TNS preconditioner sample (reference: clients/samples/tns.cpp):
truncated Neumann series preconditioned CG."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.laplacian_2d(48)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
M = rt.precond.tns(A)
x, info = rt.cg(A, b, M=M, rel_tol=1e-8, max_iter=2000)
print(f"cg+tns: iters={int(info.iterations)} status={int(info.status)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
