"""Benchmark sample (reference: clients/samples/benchmark.cpp): per-op
bandwidth sweep over BLAS-1 and per-format SpMV with the reference byte
models. The root-level bench.py is the full driver; this sample runs a
smaller sweep through the same public API."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import time

import numpy as np

import jax
import jax.numpy as jnp

import rocalution_tpu as rt

n = 1 << 20
reps = 100
x = jnp.asarray(np.random.default_rng(0).standard_normal(n) / n)
y = jnp.asarray(np.random.default_rng(1).standard_normal(n))


def chain(step, v):
    @jax.jit
    def run(v, k):
        return jnp.sum(jax.lax.fori_loop(0, k, lambda i, c: step(c), v))

    float(run(v, 2))                              # compile
    t0 = time.perf_counter(); float(run(v, reps)); t1 = time.perf_counter()
    float(run(v, 2 * reps)); t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / reps, 1e-12)


fs = np.dtype(np.float32).itemsize if x.dtype == jnp.float32 else 8
t = chain(lambda c: c + np.float32(1e-6) * y, x)
print(f"axpy    {3*n*fs/t/1e9:8.1f} GB/s  {2*n/t/1e9:8.1f} GFlop/s")
t = chain(lambda c: c + (np.float32(1e-12) * jnp.dot(c, y)) * y, x)
print(f"dot     {2*n*fs/t/1e9:8.1f} GB/s  {2*n/t/1e9:8.1f} GFlop/s")

A = rt.laplacian_3d(48)
xv = jnp.asarray(
    np.random.default_rng(2).standard_normal(A.shape[0]) / A.shape[0]
).astype(A.dtype)
for fmt in ("DIA", "ELL", "HYB"):
    B = rt.convert(A, fmt)
    t = chain(lambda c, B=B: rt.spmv(B, c) * np.float32(1 / 8.0), xv)
    gbs = (fs + 4) * A.nnz / t / 1e9
    print(f"spmv[{fmt:4s}] {gbs:8.1f} GB/s  {2*A.nnz/t/1e9:8.1f} GFlop/s")
