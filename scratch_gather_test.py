"""Experiment: which gather forms does Mosaic TPU support, and how fast?

Candidates for the SpMV inner gather x[indices]:
  A. full VMEM gather: jnp.take(x_flat, idx)    (arbitrary indices)
  B. sublane gather: take_along_axis(x2d (N,128), idx (M,128), axis=0)
  C. lane gather within 128: take_along_axis(x (8,128), idx (8,128), axis=1)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128 * 1024  # x size: 512 KB f32
M = 8 * 1024    # gather count per kernel block


def timeit(f, *args, reps=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    # force a host read to defeat async-enqueue returns
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., 0]
    t1 = time.perf_counter()
    return (t1 - t0) / reps


def report(name, fn, *args, bytes_moved=None):
    try:
        dt = timeit(fn, *args)
        msg = f"{name}: {dt*1e6:9.1f} us"
        if bytes_moved:
            msg += f"  -> {bytes_moved/dt/1e9:8.1f} GB/s"
        print(msg)
    except Exception as e:
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}")


# ---- A. full flat gather inside pallas -------------------------------------
def kern_a(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)


@jax.jit
def gather_a(x, idx):
    return pl.pallas_call(
        kern_a,
        out_shape=jax.ShapeDtypeStruct(idx.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


# ---- B. sublane gather via take_along_axis axis=0 ---------------------------
def kern_b(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


@jax.jit
def gather_b(x2, idx2):
    return pl.pallas_call(
        kern_b,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, x2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx2)


# ---- C. lane gather within 128 ----------------------------------------------
def kern_c(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


@jax.jit
def gather_c(x2, idx2):
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct(idx2.shape, x2.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx2)


# ---- D. pure streaming read bandwidth (sanity roofline) --------------------
def kern_d(x_ref, o_ref):
    o_ref[0, 0] = jnp.sum(x_ref[:])


@jax.jit
def stream_d(xbig):
    grid = xbig.shape[0] // 512
    return pl.pallas_call(
        lambda x_ref, o_ref: kern_stream(x_ref, o_ref),
        out_shape=jax.ShapeDtypeStruct((grid, 128), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec((512, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xbig)


def kern_stream(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=0, keepdims=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N,), jnp.float32)
    idx = jax.random.randint(key, (M,), 0, N, jnp.int32)
    report("A  flat gather (8192 of 128k)", gather_a, x, idx,
           bytes_moved=M * 4)

    x2 = x.reshape(-1, 128)
    idx2 = jax.random.randint(key, (64, 128), 0, x2.shape[0], jnp.int32)
    report("B  sublane take_along_axis", gather_b, x2, idx2,
           bytes_moved=64 * 128 * 4)

    x3 = jax.random.normal(key, (512, 128), jnp.float32)
    idx3 = jax.random.randint(key, (512, 128), 0, 128, jnp.int32)
    report("C  lane take_along_axis", gather_c, x3, idx3,
           bytes_moved=512 * 128 * 4)

    xbig = jax.random.normal(key, (512 * 512, 128), jnp.float32)  # 128 MB
    report("D  stream read 128MB", stream_d, xbig,
           bytes_moved=xbig.size * 4)
