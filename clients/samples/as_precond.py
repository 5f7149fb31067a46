"""Additive Schwarz sample (reference: clients/samples/as-precond.cpp):
AS and restricted AS preconditioned CG."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.precond import additive_schwarz

A = rt.laplacian_2d(48)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
for restricted in (False, True):
    M = additive_schwarz(A, num_blocks=4, overlap=8, restricted=restricted)
    x, info = rt.cg(A, b, M=M, rel_tol=1e-8, max_iter=2000)
    kind = "ras" if restricted else "as"
    print(f"cg+{kind}: iters={int(info.iterations)} "
          f"status={int(info.status)} "
          f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
