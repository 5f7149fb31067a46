import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rocalution_tpu as rt
from rocalution_tpu.formats.wjd import from_csr
from rocalution_tpu.ops.pallas.spmv_wjd import wjd_spmv
from rocalution_tpu.ops.spmv import spmv

rng = np.random.default_rng(1)
n = 1_000_000
rows = np.repeat(np.arange(n, dtype=np.int64), 7)
d = rng.integers(-8192, 8193, size=rows.shape[0])
cols = np.clip(rows + d, 0, n - 1)
vals = rng.standard_normal(rows.shape[0]).astype(np.float32)
t0 = time.perf_counter()
B = rt.CSR.from_coo(np.concatenate([rows, cols]), np.concatenate([cols, rows]),
                    np.concatenate([vals, vals]), (n, n))
print("csr built", time.perf_counter()-t0, "nnz", B.nnz, flush=True)
t0 = time.perf_counter()
W = from_csr(B)
print(f"converted {time.perf_counter()-t0:.1f}s TK={W.brow.shape} wlog={W.wlog} grp={W.group} pad={W.padding_ratio:.2f}x spill={W.spill_row.shape[0]}", flush=True)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32)/n)

# correctness vs XLA CSR path (jitted, matrices as args)
@jax.jit
def relerr(Wm, Bm, v):
    y = wjd_spmv(Wm, v)
    prod = Bm.data * v[Bm.indices]
    yref = jax.ops.segment_sum(prod, Bm.row_ids, num_segments=n, indices_are_sorted=True)
    return jnp.max(jnp.abs(y - yref)) / jnp.max(jnp.abs(yref))
t0=time.perf_counter()
print("relerr:", float(relerr(W, B, x)), f"({time.perf_counter()-t0:.1f}s)", flush=True)

@jax.jit
def run(Wm, v, k):
    return jnp.sum(jax.lax.fori_loop(0, k, lambda i, c: wjd_spmv(Wm, c) * np.float32(1/4.), v))
def timed(k):
    t0=time.perf_counter(); float(run(W, x, k)); return time.perf_counter()-t0
t0=time.perf_counter(); float(run(W, x, 2)); print("chain compiled", time.perf_counter()-t0, flush=True)
tK = min(timed(50) for _ in range(3)); t2K = min(timed(100) for _ in range(3))
per = (t2K - tK)/50
print(f"per-op {per*1e6:.1f} us -> {8*W.nnz/per/1e9:.1f} GB/s ({W.nnz/per/1e9:.2f} Gnnz/s)", flush=True)
