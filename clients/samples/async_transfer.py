"""Async build/transfer sample (reference: clients/samples/async.cpp,
Solver::BuildMoveToAcceleratorAsync). JAX dispatch is asynchronous by
design: device_put and jitted calls return futures immediately; host-side
setup (the Build stage) overlaps with in-flight device work."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import time

import numpy as np

import jax

import rocalution_tpu as rt

A = rt.laplacian_2d(128)
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))

# enqueue a full CG solve (returns at dispatch — async)
t0 = time.perf_counter()
x, info = rt.cg(A, b, M=rt.jacobi(A), rel_tol=1e-8, max_iter=2000)
t_dispatch = time.perf_counter() - t0

# overlap: build a SECOND preconditioner on the host while the device
# solve is in flight (the reference's BuildMoveToAcceleratorAsync overlap)
t0 = time.perf_counter()
M2 = rt.precond.ilu(A, 0)
t_build = time.perf_counter() - t0

jax.block_until_ready(x)
err = np.linalg.norm(np.asarray(x) - 1)
print(f"dispatch={t_dispatch*1e3:.1f}ms (async) "
      f"host ILU build overlapped={t_build*1e3:.1f}ms err={err:.2e}")

x2, info2 = rt.cg(A, b, M=M2, rel_tol=1e-8, max_iter=2000)
print(f"cg+ilu0 (built during overlap): iters={int(info2.iterations)} "
      f"err={np.linalg.norm(np.asarray(x2)-1):.2e}")
