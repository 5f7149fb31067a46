"""CG preconditioned with one SA-AMG V-cycle (reference:
clients/samples/cg-amg.cpp) — also demos RS/UA/pairwise via argv[1]."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import sys
import time

import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.solvers.multigrid import amg_hierarchy, amg_precond

kind = sys.argv[1] if len(sys.argv) > 1 else "sa"
n = int(sys.argv[2]) if len(sys.argv) > 2 else 128

A = rt.laplacian_2d(n)
b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))

t0 = time.perf_counter()
h = amg_hierarchy(A, kind)
t_setup = time.perf_counter() - t0
print(f"{kind}-AMG hierarchy: levels={h.num_levels} sizes={h.operator_sizes()}"
      f" setup={t_setup*1e3:.0f}ms")

M = amg_precond(h)
t0 = time.perf_counter()
x, info = rt.cg(A, b, M=M, rel_tol=1e-8, max_iter=500)
x = np.asarray(x)
print(f"CG+{kind}AMG: iters={int(info.iterations)} "
      f"res={float(info.final_res):.3e} "
      f"solve={1e3*(time.perf_counter()-t0):.1f}ms "
      f"err={np.linalg.norm(x-1.0):.2e}")
