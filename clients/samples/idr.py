"""IDR(s) sample (reference: clients/samples/idr.cpp)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.convection_diffusion_2d(40)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
for s in (1, 2, 4):
    x, info = rt.idr(A, b, M=rt.jacobi(A), shadow_space=s,
                     rel_tol=1e-8, max_iter=4000)
    print(f"idr({s})+jacobi: iters={int(info.iterations)} "
          f"status={int(info.status)} "
          f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
