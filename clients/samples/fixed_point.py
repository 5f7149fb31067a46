"""Fixed-point iteration sample (reference: clients/samples/fixed-point.cpp):
x += omega * M^-1 r with Jacobi."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.laplacian_2d(32)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
x, info = rt.fixed_point(A, b, M=rt.jacobi(A), omega=1.0,
                         rel_tol=1e-6, max_iter=20000)
print(f"fixed-point(jacobi): iters={int(info.iterations)} "
      f"status={int(info.status)} err={np.linalg.norm(np.asarray(x)-1):.2e}")
