"""Kernel variants to find where per-slot time goes."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import rocalution_tpu as rt
from rocalution_tpu.formats.wjd import from_csr, NJ
from rocalution_tpu.ops.pallas.spmv_wjd import _lane_gather

A = rt.laplacian_3d(100, dtype=np.float32)
W = from_csr(A)
Tp, K = W.brow.shape
group = W.group
n = A.shape[0]
x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32)/1e6)
print("TK", W.brow.shape, "nnz", W.nnz, flush=True)

def kern_v2(brow_ref, diag_ref, x_ref, val_ref, u_ref, y_ref):
    """static unroll over K, 3 dynamic loads per slot"""
    step = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for g in range(group):
        t = step * group + g
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            base = brow_ref[t, k]
            dl = lane + u_ref[g, k]
            c = dl & 127
            j = dl >> 7
            g0 = _lane_gather(x_ref[pl.ds(base, 8), :], c)
            g1 = _lane_gather(x_ref[pl.ds(base + 1, 8), :], c)
            g2 = _lane_gather(x_ref[pl.ds(base + 2, 8), :], c)
            gat = jnp.where(j == 0, g0, jnp.where(j == 1, g1, g2))
            acc = acc + val_ref[g, k] * gat
        y_ref[g] = acc

def kern_v3(brow_ref, diag_ref, x_ref, val_ref, u_ref, y_ref):
    """static unroll, single 16-row load + static sublane-slice views"""
    step = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    for g in range(group):
        t = step * group + g
        acc = jnp.zeros((8, 128), jnp.float32)
        for k in range(K):
            base = brow_ref[t, k]
            dl = lane + u_ref[g, k]
            c = dl & 127
            j = dl >> 7
            win = x_ref[pl.ds(base, 16), :]
            g0 = _lane_gather(win[0:8], c)
            g1 = _lane_gather(win[1:9], c)
            g2 = _lane_gather(win[2:10], c)
            gat = jnp.where(j == 0, g0, jnp.where(j == 1, g1, g2))
            acc = acc + val_ref[g, k] * gat
        y_ref[g] = acc

def build(kern):
    @jax.jit
    def apply_(Wm, xp2d):
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(Tp // group,),
                    in_specs=[
                        pl.BlockSpec(xp2d.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((group, K, 8, 128), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((group, K, 8, 128), lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((group, 8, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), jnp.float32),
            )(Wm.brow, Wm.diag_u, xp2d, Wm.data, Wm.uloc)
    return apply_

pad_hi = W.xp_len - W.pad_lo - n
def bench(name, apply_):
    @jax.jit
    def run(Wm, v, k):
        def stepf(i, c):
            xp = jnp.pad(c, (W.pad_lo, pad_hi)).reshape(W.xp_len // 128, 128)
            y = apply_(Wm, xp).reshape(-1)[:n]
            return y * np.float32(1/12.)
        return jnp.sum(jax.lax.fori_loop(0, k, stepf, v))
    def timed(k):
        t0=time.perf_counter(); float(run(W, x, k)); return time.perf_counter()-t0
    try:
        t0=time.perf_counter(); float(run(W, x, 2)); ct = time.perf_counter()-t0
        tK = min(timed(200) for _ in range(3)); t2K = min(timed(400) for _ in range(3))
        per = (t2K - tK)/200
        print(f"{name}: compile {ct:.1f}s  per-op {per*1e6:7.1f} us -> {8*W.nnz/per/1e9:6.1f} GB/s ({W.nnz/per/1e9:5.2f} Gnnz/s)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

bench("v2 unrollK 3dynload", build(kern_v2))
bench("v3 unrollK 1load+slice", build(kern_v3))
