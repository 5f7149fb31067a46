"""Microbench v3: scalar readback only; reps passed as runtime scalar so one
compile serves K and 2K; per-op = (t2K - tK)/K.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_pair(run, x, idx, K):
    def t(k):
        kk = jnp.int32(k)
        t0 = time.perf_counter()
        out = run(x, idx, kk)
        v = float(out[0, 0])
        return time.perf_counter() - t0, v

    t(2)  # compile+warm
    t1 = min(t(K)[0] for _ in range(3))
    t2 = min(t(2 * K)[0] for _ in range(3))
    return (t2 - t1) / K


def bench_gather(S, axis, K=20000):
    def kern(reps_ref, x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            return jnp.take_along_axis(acc, idx, axis=axis)

        r = jax.lax.fori_loop(0, reps_ref[0], body, x)
        o_ref[0, 0] = jnp.sum(r)

    @jax.jit
    def run(x, idx, reps):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(jnp.reshape(reps, (1,)), x, idx)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (S, 128), jnp.float32)
    hi = S if axis == 0 else 128
    idx = jax.random.randint(key, (S, 128), 0, hi, jnp.int32)
    try:
        per_op = timed_pair(run, x, idx, K)
        elems = S * 128
        print(f"dyn_gather axis={axis} ({S},128): {per_op*1e9:8.1f} ns/op "
              f"-> {elems/per_op/1e9:7.2f} Gelem/s")
    except Exception as e:
        print(f"dyn_gather axis={axis} ({S},128): FAILED {type(e).__name__}: "
              f"{str(e)[:160]}")


def bench_stream(M=2048, G=256):
    """HBM stream: grid over G blocks of (M,128) f32, reduce to scalar."""
    def kern(x_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[0, 0] = 0.0
        acc_ref[0, 0] += jnp.sum(x_ref[:])

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            o_ref[0, 0] = acc_ref[0, 0]

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid=(G,),
            in_specs=[pl.BlockSpec((M, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(x)

    x = jax.random.normal(jax.random.PRNGKey(1), (G * M, 128), jnp.float32)
    nbytes = x.size * 4
    out = run(x)
    float(out[0, 0])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x)[0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"stream read {nbytes/1e6:.0f} MB: {best*1e3:.2f} ms -> "
          f"{nbytes/best/1e9:.1f} GB/s  (incl ~ms dispatch)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_stream()
    bench_gather(8, axis=0)
    bench_gather(16, axis=0)
    for S in (8, 64, 256):
        bench_gather(S, axis=1)
