"""Pallas SpMV kernel for the WJD format (see formats/wjd.py).

This is the TPU device-kernel layer the reference implements with
rocSPARSE csrmv + hand-written HIP kernels (hip_matrix_csr.cpp:1215-1276,
hip_kernels_csr.hpp). Design:

* grid = one step per GROUP of row tiles; each step streams that group's
  slot vregs (values + local offsets) HBM->VMEM while x stays resident in
  VMEM for the whole call;
* per slot, the kernel loads one sublane-aligned block of x-window rows
  and resolves the column gather with nj `tpu.dynamic_gather` lane-
  shuffles on its static (8,128) sub-views plus a select on (l+u)>>7 —
  no scatter: the product lands at its row's own (sublane, lane) position
  and accumulation is a plain vreg add;
* the slot loop is STATICALLY UNROLLED (in chunks for large K): a
  `fori_loop` over slots serializes on the accumulator and costs 5x
  (measured 102 -> 19 ns/slot on v5e) — unrolling lets the gathers of
  consecutive slots pipeline.

Everything is static-shaped; the kernel runs under `jit` and inside
`lax.while_loop` solver bodies like every other op in the package.

Performance (v5e, 1M-row 3D Laplacian, f32): 134 us/op = 52 Gnnz/s
= 419 GB/s by the reference's (4+4)B/nnz model (51% of HBM roofline);
round-1 XLA CSR path: 0.52 GB/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats.wjd import WJD, _load_rows

_LANE_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,),
)

_UNROLL = 8          # slots per unrolled chunk when K is large
_UNROLL_MAX = 24     # fully unroll the slot loop up to this K


def _lane_gather(win, c):
    """out[s, l] = win[s, c[s, l]] — lowers to `tpu.dynamic_gather` (one
    lane-shuffle vreg op). Calls lax.gather directly: jnp.take_along_axis
    would upcast the indices to int64 under jax_enable_x64, which Mosaic
    cannot lower."""
    return jax.lax.gather(
        win, c[..., None], _LANE_DNUMS, slice_sizes=(1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _kernel(brow_ref, diag_ref, x_ref, val_ref, u_ref, y_ref, *,
            K, group, nj):
    step = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    rows = _load_rows(nj)

    def slot(t, g, k, acc):
        base = brow_ref[t, k]
        dl = lane + u_ref[g, k].astype(jnp.int32)   # in [0, 127 + win)
        c = dl & 127
        j = dl >> 7                      # gather candidate in [0, nj)
        win = x_ref[pl.ds(base, rows), :]
        gat = _lane_gather(win[0:8], c)
        for jj in range(1, nj):          # static: nj-1 more lane-gathers
            gv = _lane_gather(win[jj:jj + 8], c)
            gat = jnp.where(j == jj, gv, gat)
        return acc + val_ref[g, k] * gat

    for g in range(group):               # static unroll over tiles
        t = step * group + g
        acc = jnp.zeros((8, 128), acc_dtype)
        if K <= _UNROLL_MAX:
            for k in range(K):           # full static unroll
                acc = slot(t, g, k, acc)
        else:
            nchunk = K // _UNROLL

            def chunk(ci, acc):
                k0 = ci * _UNROLL
                for dk in range(_UNROLL):
                    acc = slot(t, g, k0 + dk, acc)
                return acc

            acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunk),
                                    chunk, acc)
            for k in range(nchunk * _UNROLL, K):   # static tail
                acc = slot(t, g, k, acc)
        y_ref[g] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wjd_apply(A: WJD, xp2d, *, interpret=False):
    # Trace with x64 disabled: the package enables jax_enable_x64 for f64
    # host math, but Mosaic has no 64-bit types — under x64 the Python-int
    # constants in BlockSpec index maps trace as i64 and fail to legalize.
    # All kernel operands are already 32-bit, so this is purely a tracing-
    # time promotion rule switch.
    with jax.enable_x64(False):
        return _wjd_apply_32(A, xp2d, interpret)


def _wjd_apply_32(A: WJD, xp2d, interpret):
    Tp, K = A.brow.shape
    group = A.group
    grid = (Tp // group,)
    kern = functools.partial(_kernel, K=K, group=group, nj=A.nj)
    y = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,           # brow, diag_u
            grid=grid,
            in_specs=[
                pl.BlockSpec(xp2d.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, K, 8, 128),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, K, 8, 128),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group, 8, 128),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), A.data.dtype),
        interpret=interpret,
    )(A.brow, A.diag_u, xp2d, A.data, A.uloc)
    return y


def wjd_spmv(A: WJD, x, *, interpret: bool | None = None):
    """y = A @ x for a WJD matrix; single right-hand side."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = A.shape
    pad_hi = A.xp_len - A.pad_lo - m
    xp = jnp.pad(x, (A.pad_lo, pad_hi))
    xp2d = xp.reshape(A.xp_len // 128, 128)
    y = _wjd_apply(A, xp2d, interpret=interpret).reshape(-1)[:n]
    if A.spill_row.shape[0]:
        prod = A.spill_val * x[A.spill_col]
        y = y + jax.ops.segment_sum(prod, A.spill_row, num_segments=n)
    return y
