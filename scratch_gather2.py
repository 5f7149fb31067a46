"""Microbench v2: raw rate of tpu.dynamic_gather (sublane + lane modes),
measured with in-kernel fori_loop repetition (no dispatch overhead) and the
dependent-chain protocol from bench.py.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 1000


def make_gather_kernel(axis):
    def kern(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            g = jnp.take_along_axis(acc, idx, axis=axis)
            return g * 0.999998  # keep dependent, bounded

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x)
    return kern


def bench_gather(S, axis):
    kern = make_gather_kernel(axis)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (S, 128), jnp.float32)
    hi = S if axis == 0 else 128
    idx = jax.random.randint(key, (S, 128), 0, hi, jnp.int32)
    try:
        out = run(x, idx)
        jax.block_until_ready(out)
        _ = np.asarray(out)[0, 0]
        t0 = time.perf_counter()
        out = run(x, idx)
        _ = np.asarray(out)[0, 0]
        t1 = time.perf_counter()
        per_op = (t1 - t0) / REPS
        elems = S * 128
        print(f"dyn_gather axis={axis} ({S},128): {per_op*1e9:8.1f} ns/op "
              f"-> {elems/per_op/1e9:7.2f} Gelem/s")
    except Exception as e:
        print(f"dyn_gather axis={axis} ({S},128): FAILED {type(e).__name__}: "
              f"{str(e)[:200]}")


def bench_stream():
    """HBM streaming read rate through a pallas grid."""
    M = 2048  # rows of 128-lane tiles; 2048*128*4 = 1 MB per block
    G = 128   # grid steps -> 128 MB total

    def kern(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True) + jnp.zeros(
            (8, 128), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
            grid=(G,),
            in_specs=[pl.BlockSpec((M, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    x = jax.random.normal(jax.random.PRNGKey(1), (G * M, 128), jnp.float32)
    out = run(x)
    _ = np.asarray(out)[0, 0]
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(x)
        _ = np.asarray(out)[0, 0]
        best = min(best, time.perf_counter() - t0)
    nbytes = x.size * 4
    print(f"stream read {nbytes/1e6:.0f} MB: {best*1e3:.2f} ms -> "
          f"{nbytes/best/1e9:.1f} GB/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_stream()
    for S in (8, 32, 256, 1024):
        bench_gather(S, axis=0)
    for S in (8, 32, 256):
        bench_gather(S, axis=1)
