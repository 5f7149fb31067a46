"""Measure WJD SpMV on the real TPU: laplacian_3d(100) + RCM-band random SPD."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.formats.wjd import from_csr
from rocalution_tpu.ops.pallas.spmv_wjd import wjd_spmv


def chain_time(step, x0, budget_s=0.3):
    @jax.jit
    def run(v, k):
        out = jax.lax.fori_loop(0, k, lambda i, c: step(c), v)
        return jnp.sum(out)

    def timed(k):
        t0 = time.perf_counter()
        float(run(x0, k))
        return time.perf_counter() - t0

    float(run(x0, 2))
    est = max((timed(66) - timed(2)) / 64, 1e-9)
    K = int(max(2, min(20000, budget_s / est)))
    timed(K); timed(2 * K)
    t1 = min(timed(K) for _ in range(3))
    t2 = min(timed(2 * K) for _ in range(3))
    return max((t2 - t1) / K, 1e-12)


def bench(name, A_csr, n):
    t0 = time.perf_counter()
    W = from_csr(A_csr)
    t_conv = time.perf_counter() - t0
    nnz = W.nnz
    Tp, K = W.brow.shape
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32) / n)
    scale = np.float32(1.0 / 12.0)
    t = chain_time(lambda c: wjd_spmv(W, c) * scale, x)
    gbps = 8 * nnz / t / 1e9
    slots = Tp * K
    pad = slots * 1024 / max(nnz, 1)
    print(f"{name}: conv={t_conv*1e3:.0f}ms K={K} Tp={Tp} pad={pad:.2f}x "
          f"spill={W.spill_row.shape[0]} {t*1e6:9.1f} us/op -> {gbps:7.1f} GB/s "
          f"({nnz/t/1e9:.1f} Gnnz/s)")


print("device:", jax.devices())
A = rt.laplacian_3d(100, dtype=np.float32)
bench("laplacian_3d(100) 1M", A, A.shape[0])

# banded random SPD (the RCM-permuted stand-in): n=1M, ~7 nnz/row, bandwidth 8192
rng = np.random.default_rng(1)
n = 1_000_000
nnz_per_row = 7
rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
d = rng.integers(-8192, 8193, size=rows.shape[0])
cols = np.clip(rows + d, 0, n - 1)
vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
B = rt.CSR.from_coo(np.concatenate([rows, cols]), np.concatenate([cols, rows]),
                    np.concatenate([vals, vals]), (n, n))
bench(f"rand band8k 1M nnz={B.nnz}", B, n)
