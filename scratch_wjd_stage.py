import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import rocalution_tpu as rt
from rocalution_tpu.formats.wjd import from_csr
from rocalution_tpu.ops.pallas.spmv_wjd import wjd_spmv
from rocalution_tpu.ops.spmv import spmv

print("device:", jax.devices(), flush=True)
A = rt.laplacian_3d(100, dtype=np.float32)
W = from_csr(A)
x = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape[0]).astype(np.float32)/1e6)

@jax.jit
def one(Wm, v):
    return jnp.sum(wjd_spmv(Wm, v))
t0=time.perf_counter(); float(one(W, x)); print("wjd-alone compile+run", time.perf_counter()-t0, flush=True)

@jax.jit
def run(Wm, v, k):
    return jnp.sum(jax.lax.fori_loop(0, k, lambda i, c: wjd_spmv(Wm, c) * np.float32(1/12.), v))
def timed(k):
    t0=time.perf_counter(); float(run(W, x, k)); return time.perf_counter()-t0
t0=time.perf_counter(); float(run(W, x, 2)); print("chain compiled", time.perf_counter()-t0, flush=True)
tK = min(timed(200) for _ in range(3)); t2K = min(timed(400) for _ in range(3))
per = (t2K - tK)/200
print(f"per-op {per*1e6:.1f} us -> {8*W.nnz/per/1e9:.1f} GB/s ({W.nnz/per/1e9:.2f} Gnnz/s)", flush=True)
