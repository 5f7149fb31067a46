"""Pallas SpMV kernels for the WJD format (see formats/wjd.py).

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

Two kernels share this structure:

* `_kernel` — native f32/bf16 values, one accumulator vreg per tile.
* `_kernel_ff` — float-float f64: values arrive as exact (hi, lo) f32
  pairs (v = hi + lo), x likewise; each product is a Dekker two-product
  (Veltkamp split, no FMA needed on the VPU) and accumulation is
  compensated (TwoSum) into an (acc, acc_lo) vreg pair. Result accuracy
  ~2^-48 relative (~1e-14) — the TPU answer to the reference's natively
  double csrmv; semantics documented in BASELINE.md.

Everything is static-shaped; the kernels run under `jit` and inside
`lax.while_loop` solver bodies like every other op in the package.

Performance (v5e, 1M-row 3D Laplacian): f32 127.7 us/op = 435 GB/s by the
reference byte model (53% of HBM roofline, BENCH_r02 tail); round-1 XLA
CSR path: 0.52 GB/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats.wjd import WJD, X_VMEM_BUDGET, _load_rows

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


def _window_gather(win, c, j, nj):
    """Resolve the slot's column gather: nj lane-shuffles on the static
    8-row sub-views of the x window + selects on the row correction j."""
    gat = _lane_gather(win[0:8], c)
    for jj in range(1, nj):          # static: nj-1 more lane-gathers
        gv = _lane_gather(win[jj:jj + 8], c)
        gat = jnp.where(j == jj, gv, gat)
    return gat


# --- float-float helpers (all plain VPU ops; no FMA required) -------------

def _two_sum(a, b):
    """Knuth TwoSum: a + b = s + err exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


# Error-free transformations assume every intermediate is ROUNDED once;
# mul+add->fma contraction (XLA CPU does it unconditionally — measured — and
# neither optimization_barrier nor bitcast round-trips stop the emitter)
# silently skips that rounding, so e.g. `acc + p` with p = vh*gh becomes
# fma(vh, gh, acc) and the TwoSum compensation then "corrects" a sum that
# never happened (measured: 1-ulp hi error with a stale lo). The fix: pin
# each product by multiplying with a runtime-opaque 1.0f (`one`, an SMEM
# kernel operand Mosaic cannot constant-fold). If THAT mul is contracted
# into a following add, fma(t, one, c) == fl(t*1 + c) == fl(t + c) — i.e.
# the contraction becomes harmless by construction.

def _split32(a, one):
    """Veltkamp split of f32 into 12-bit halves: a = hi + lo exactly."""
    c = (a * 4097.0) * one           # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b, one):
    """Dekker two-product: a * b = p + e exactly (f32, no FMA)."""
    p = (a * b) * one
    ah, al = _split32(a, one)
    bh, bl = _split32(b, one)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _unrolled_slots(K, slot, carry):
    """Run `slot(k, carry) -> carry` for k in [0, K): fully unrolled when
    small, else fori_loop over unrolled chunks + static tail."""
    if K <= _UNROLL_MAX:
        for k in range(K):
            carry = slot(k, carry)
        return carry
    nchunk = K // _UNROLL

    def chunk(ci, carry):
        k0 = ci * _UNROLL
        for dk in range(_UNROLL):
            carry = slot(k0 + dk, carry)
        return carry

    carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunk), chunk, carry)
    for k in range(nchunk * _UNROLL, K):   # static tail
        carry = slot(k, carry)
    return carry


def _kernel(brow_ref, diag_ref, x_ref, val_ref, u_ref, y_ref, *,
            K, group, nj):
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    rows = _load_rows(nj)

    for g in range(group):               # static unroll over tiles
        def slot(k, acc, g=g):
            base = brow_ref[0, g, k]
            dl = lane + u_ref[g, k].astype(jnp.int32)   # in [0, 127 + win)
            c = dl & 127
            j = dl >> 7                  # gather candidate in [0, nj)
            win = x_ref[pl.ds(base, rows), :]
            gat = _window_gather(win, c, j, nj)
            v = val_ref[g, k]
            if v.dtype != acc_dtype:         # bf16 values, f32 accumulate
                v = v.astype(acc_dtype)
            return acc + v * gat

        y_ref[g] = _unrolled_slots(K, slot, jnp.zeros((8, 128), acc_dtype))


def _roll_fn(interpret):
    """Dynamic lane-rotate: tpu.dynamic_rotate via pltpu.roll on hardware,
    jnp.roll in interpret mode (identical semantics)."""
    if interpret:
        return lambda v, sh: jnp.roll(v, sh, axis=1)
    return lambda v, sh: pltpu.roll(v, sh, 1)


def _rolled_window(x_ref, base, du, lane, roll):
    """Resolve a constant-offset slot's gather with ONE rotate over a
    single 16-row load: out[s, l] = x[base + (du>>7) +
    ((l + du&127) >= 128) + s, (l + du) & 127]. The two row views needed
    by the lane-boundary select are static sub-views of one rolled
    buffer (measured +3.6% over separate 8-row loads + two rolls; the
    remaining ~12.6 ns/slot is the VPU op floor of load+rotate+select+
    fma — static shifts/addresses measured no faster, see BASELINE.md)."""
    q = du >> 7
    c0 = du & 127
    w = x_ref[pl.ds(base + q, 16), :]
    sh = (128 - c0) & 127
    R = roll(w, sh)
    return jnp.where(lane < 128 - c0, R[0:8], R[1:9])


def _kernel_roll(brow_ref, diag_ref, x_ref, val_ref, y_ref, *,
                 K, group, interpret):
    """Roll-mode SpMV: every slot holds one diagonal offset (diag_ref), so
    the column resolve is a single dynamic lane-rotate and the uloc plane
    is never streamed (banded/stencil fast path; cf. the reference's DIA
    kernels, hip_matrix_dia.cpp — here it serves arbitrary CSR input whose
    slots happen to be banded, which is most of a WJD'd stencil matrix)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    roll = _roll_fn(interpret)

    for g in range(group):
        def slot(k, acc, g=g):
            gat = _rolled_window(x_ref, brow_ref[0, g, k], diag_ref[0, g, k],
                                 lane, roll)
            v = val_ref[g, k]
            if v.dtype != acc_dtype:         # bf16 values, f32 accumulate
                v = v.astype(acc_dtype)
            return acc + v * gat

        y_ref[g] = _unrolled_slots(K, slot, jnp.zeros((8, 128), acc_dtype))


def _kernel_roll_ff(brow_ref, diag_ref, one_ref, xh_ref, xl_ref, vh_ref,
                    vl_ref, yh_ref, yl_ref, *, K, group, interpret):
    """Roll-mode float-float SpMV (see _kernel_ff for the arithmetic)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    one = one_ref[0, 0]
    roll = _roll_fn(interpret)

    for g in range(group):
        def slot(k, carry, g=g):
            acc, accl = carry
            base = brow_ref[0, g, k]
            du = diag_ref[0, g, k]
            gh = _rolled_window(xh_ref, base, du, lane, roll)
            gl = _rolled_window(xl_ref, base, du, lane, roll)
            vh = vh_ref[g, k]
            vl = vl_ref[g, k]
            p, e = _two_prod(vh, gh, one)
            e = e + (vh * gl + vl * gh)
            acc, err = _two_sum(acc, p)
            return acc, accl + (err + e)

        zero = jnp.zeros((8, 128), jnp.float32)
        acc, accl = _unrolled_slots(K, slot, (zero, zero))
        yh_ref[g] = acc
        yl_ref[g] = accl


def _kernel_roll_hbm(brow_ref, diag_ref, wb_ref, wbn_ref, x_hbm, val_ref,
                     y_ref, xw0, xw1, sem0, sem1, *,
                     K, group, win_rows, interpret):
    """Roll-mode SpMV with x resident in HBM: each grid step works from a
    (win_rows, 128) x window in VMEM scratch (window base = per-step
    win_base scalar; slot addressing is window-relative). This removes the
    whole-x VMEM residency that capped a single chip at ~4M rows (scoped
    VMEM is 16 MB; a 16.7M-row x plane is 67 MB — seen on hardware).

    The windows are DOUBLE-BUFFERED: while step i computes from buffer
    i%2, the copy for step i+1 (its base arrives via `wbn_ref`, the
    clamped i+1 block of win_base) streams into the other buffer — the
    per-step DMA overlaps compute instead of serializing with it. Banded
    operators keep win_rows small (3D Laplacian at 256³ with the windowed
    group size: ~1.6k rows = 0.8 MB/buffer)."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    roll = _roll_fn(interpret)
    wb = wb_ref[0, 0, 0]
    wbn = wbn_ref[0, 0, 0]

    def compute(xwin):
        for g in range(group):
            def slot(k, acc, g=g):
                gat = _rolled_window(xwin, brow_ref[0, g, k] - wb,
                                     diag_ref[0, g, k], lane, roll)
                v = val_ref[g, k]
                if v.dtype != acc_dtype:
                    v = v.astype(acc_dtype)
                return acc + v * gat

            y_ref[g] = _unrolled_slots(
                K, slot, jnp.zeros((8, 128), acc_dtype))

    def own_copy(buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wb, win_rows), :], buf, sem)

    def next_copy(buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wbn, win_rows), :], buf, sem)

    @pl.when(step == 0)
    def _():
        own_copy(xw0, sem0).start()     # cold start for the first step

    @pl.when(step % 2 == 0)
    def _():
        own_copy(xw0, sem0).wait()      # started at step-1 (or just above)

        @pl.when(step + 1 < nsteps)
        def _():
            next_copy(xw1, sem1).start()

        compute(xw0)

    @pl.when(step % 2 == 1)
    def _():
        own_copy(xw1, sem1).wait()

        @pl.when(step + 1 < nsteps)
        def _():
            next_copy(xw0, sem0).start()

        compute(xw1)


# x planes above this stay in HBM and are windowed per grid step; below
# it the whole plane lives in VMEM for the call, which is faster (no
# per-step copy) and always fits the scoped-VMEM budget (single source of
# truth in formats/wjd.py — the planner picks the windowed-regime group
# size from the same threshold)
_X_VMEM_BUDGET = X_VMEM_BUDGET


def _kernel_hbm(brow_ref, diag_ref, wb_ref, wbn_ref, x_hbm, val_ref,
                u_ref, y_ref, xw0, xw1, sem0, sem1, *,
                K, group, nj, win_rows):
    """Gather-mode SpMV with x in HBM and double-buffered per-step windows
    (same scaffold as _kernel_roll_hbm; slot body as in _kernel). Serves
    beyond-VMEM operators whose slots are NOT single diagonals — e.g. AMG
    restriction R at multi-million fine columns."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    rows = _load_rows(nj)
    wb = wb_ref[0, 0, 0]
    wbn = wbn_ref[0, 0, 0]

    def compute(xwin):
        for g in range(group):
            def slot(k, acc, g=g):
                base = brow_ref[0, g, k] - wb
                dl = lane + u_ref[g, k].astype(jnp.int32)
                c = dl & 127
                j = dl >> 7
                win = xwin[pl.ds(base, rows), :]
                gat = _window_gather(win, c, j, nj)
                v = val_ref[g, k]
                if v.dtype != acc_dtype:
                    v = v.astype(acc_dtype)
                return acc + v * gat

            y_ref[g] = _unrolled_slots(
                K, slot, jnp.zeros((8, 128), acc_dtype))

    def own_copy(buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wb, win_rows), :], buf, sem)

    def next_copy(buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(wbn, win_rows), :], buf, sem)

    @pl.when(step == 0)
    def _():
        own_copy(xw0, sem0).start()

    @pl.when(step % 2 == 0)
    def _():
        own_copy(xw0, sem0).wait()

        @pl.when(step + 1 < nsteps)
        def _():
            next_copy(xw1, sem1).start()

        compute(xw0)

    @pl.when(step % 2 == 1)
    def _():
        own_copy(xw1, sem1).wait()

        @pl.when(step + 1 < nsteps)
        def _():
            next_copy(xw0, sem0).start()

        compute(xw1)


def _kernel_roll_ff_hbm(brow_ref, diag_ref, wb_ref, wbn_ref, one_ref,
                        xh_hbm, xl_hbm, vh_ref, vl_ref, yh_ref, yl_ref,
                        xh0, xl0, xh1, xl1, semh0, seml0, semh1, seml1, *,
                        K, group, win_rows, interpret):
    """Float-float roll SpMV with BOTH x planes in HBM, DOUBLE-BUFFERED
    like the f32 siblings (round-4 weakness 5: the synchronous start/wait
    serialized the window DMA with compute): while step i computes from
    buffer pair i%2, step i+1's hi/lo windows stream into the other pair.
    Arithmetic as in _kernel_ff."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    one = one_ref[0, 0]
    roll = _roll_fn(interpret)
    wb = wb_ref[0, 0, 0]
    wbn = wbn_ref[0, 0, 0]

    def compute(xhwin, xlwin):
        for g in range(group):
            def slot(k, carry, g=g):
                acc, accl = carry
                base = brow_ref[0, g, k] - wb
                du = diag_ref[0, g, k]
                gh = _rolled_window(xhwin, base, du, lane, roll)
                gl = _rolled_window(xlwin, base, du, lane, roll)
                vh = vh_ref[g, k]
                vl = vl_ref[g, k]
                p, e = _two_prod(vh, gh, one)
                e = e + (vh * gl + vl * gh)
                acc, err = _two_sum(acc, p)
                return acc, accl + (err + e)

            zero = jnp.zeros((8, 128), jnp.float32)
            acc, accl = _unrolled_slots(K, slot, (zero, zero))
            yh_ref[g] = acc
            yl_ref[g] = accl

    def copies(base, bh, bl, sh, sl):
        return (pltpu.make_async_copy(
                    xh_hbm.at[pl.ds(base, win_rows), :], bh, sh),
                pltpu.make_async_copy(
                    xl_hbm.at[pl.ds(base, win_rows), :], bl, sl))

    @pl.when(step == 0)
    def _():
        for c in copies(wb, xh0, xl0, semh0, seml0):
            c.start()

    @pl.when(step % 2 == 0)
    def _():
        for c in copies(wb, xh0, xl0, semh0, seml0):
            c.wait()

        @pl.when(step + 1 < nsteps)
        def _():
            for c in copies(wbn, xh1, xl1, semh1, seml1):
                c.start()

        compute(xh0, xl0)

    @pl.when(step % 2 == 1)
    def _():
        for c in copies(wb, xh1, xl1, semh1, seml1):
            c.wait()

        @pl.when(step + 1 < nsteps)
        def _():
            for c in copies(wbn, xh0, xl0, semh0, seml0):
                c.start()

        compute(xh1, xl1)


def _kernel_mrhs(brow_ref, diag_ref, x_ref, val_ref, u_ref, y_ref, *,
                 K, group, nj, kc):
    """Blocked-RHS SpMM: the slot value vreg is loaded ONCE and the lane
    gathers are batched over the kc right-hand sides (x_ref: (kc, XR, 128);
    y_ref: (kc, group, 8, 128)) — value HBM traffic is paid once per slot
    instead of once per column (the csrmm analog, hip_sparse.hpp)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc_dtype = y_ref.dtype
    rows = _load_rows(nj)

    for g in range(group):
        def slot(k, accs, g=g):
            base = brow_ref[0, g, k]
            dl = lane + u_ref[g, k].astype(jnp.int32)
            c = dl & 127
            j = dl >> 7
            v = val_ref[g, k]
            if v.dtype != acc_dtype:         # bf16 values, f32 accumulate
                v = v.astype(acc_dtype)
            out = []
            for q in range(kc):          # static unroll over RHS columns
                win = x_ref[q, pl.ds(base, rows), :]
                gat = _window_gather(win, c, j, nj)
                out.append(accs[q] + v * gat)
            return tuple(out)

        zero = jnp.zeros((8, 128), acc_dtype)
        accs = _unrolled_slots(K, slot, (zero,) * kc)
        for q in range(kc):
            y_ref[q, g] = accs[q]


def _kernel_ff(brow_ref, diag_ref, one_ref, xh_ref, xl_ref, vh_ref, vl_ref,
               u_ref, yh_ref, yl_ref, *, K, group, nj):
    """Float-float SpMV: per nonzero v*x with v = vh+vl, x = xh+xl:
    (p, e) = TwoProd(vh, xh); e += vh*xl + vl*xh (the vl*xl term is
    ~2^-72 relative — dropped); compensated accumulate into (acc, accl)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rows = _load_rows(nj)
    one = one_ref[0, 0]              # runtime-opaque 1.0f (see _two_prod)

    for g in range(group):
        def slot(k, carry, g=g):
            acc, accl = carry
            base = brow_ref[0, g, k]
            dl = lane + u_ref[g, k].astype(jnp.int32)
            c = dl & 127
            j = dl >> 7
            win_h = xh_ref[pl.ds(base, rows), :]
            win_l = xl_ref[pl.ds(base, rows), :]
            gh = _window_gather(win_h, c, j, nj)
            gl = _window_gather(win_l, c, j, nj)
            vh = vh_ref[g, k]
            vl = vl_ref[g, k]
            p, e = _two_prod(vh, gh, one)
            e = e + (vh * gl + vl * gh)
            acc, err = _two_sum(acc, p)
            return acc, accl + (err + e)

        zero = jnp.zeros((8, 128), jnp.float32)
        acc, accl = _unrolled_slots(K, slot, (zero, zero))
        yh_ref[g] = acc
        yl_ref[g] = accl


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wjd_apply(A: WJD, xp2d, *, interpret=False):
    # Trace with x64 disabled: the package enables jax_enable_x64 for f64
    # host math, but Mosaic has no 64-bit types — under x64 the Python-int
    # constants in BlockSpec index maps trace as i64 and fail to legalize.
    # All kernel operands are already 32-bit, so this is purely a tracing-
    # time promotion rule switch.
    with jax.enable_x64(False):
        return _wjd_apply_32(A, xp2d, interpret)


def _steps3(A, diag=False):
    """(Tp, K) scalar array -> (nsteps, group, K) for per-step SMEM blocks."""
    arr = A.diag_u if diag else A.brow
    Tp, K = A.brow.shape
    return arr.reshape(Tp // A.group, A.group, K)


def _specs(A, x_shapes):
    """Common grid spec pieces: (grid, in_specs for [x..., slotblocks]).

    brow/diag_u arrive as per-step (group, K) SMEM BLOCKS, not whole-array
    scalar prefetches: Mosaic stores a prefetched SMEM operand padded to
    (ceil8(Tp), 128) int32, so ANY matrix beyond ~1M rows blew the 1 MiB
    SMEM budget regardless of K (seen on hardware at 2.1M:
    'Allocation (size=1052672) would exceed memory (size=1048576)').
    Blocked SMEM operands cost one tiny DMA per grid step instead."""
    Tp, K = A.brow.shape
    group = A.group
    grid = (Tp // group,)
    x_specs = [
        pl.BlockSpec(shp, lambda i, *_, n=len(shp): (0,) * n,
                     memory_space=pltpu.VMEM)
        for shp in x_shapes
    ]
    # (nsteps, group, K) layout with (1, group, K) blocks: Mosaic requires
    # the LAST TWO block dims be whole (or 8/128-divisible) even in SMEM
    scal_spec = pl.BlockSpec((1, group, K), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    slot_spec = pl.BlockSpec((group, K, 8, 128),
                             lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((group, 8, 128), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    return grid, scal_spec, x_specs, slot_spec, out_spec, Tp, K, group


def _wjd_apply_32(A: WJD, xp2d, interpret):
    grid, scal_spec, x_specs, slot_spec, out_spec, Tp, K, group = _specs(
        A, [xp2d.shape])
    # bf16 values accumulate in f32 (half the matrix bytes, f32-quality
    # sums — no reference counterpart, rocSPARSE csrmv is f32/f64 only)
    acc_dt = (jnp.float32 if A.data.dtype == jnp.bfloat16
              else A.data.dtype)
    if A.kernel_mode == "roll":
        if (not interpret and A.win_base is not None
                and xp2d.size * xp2d.dtype.itemsize > _X_VMEM_BUDGET):
            # beyond-VMEM x: keep x in HBM, double-buffered window DMA
            nsteps = Tp // group
            wb_spec = pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.SMEM)
            wbn_spec = pl.BlockSpec(
                (1, 1, 1),
                lambda i, *_: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
                memory_space=pltpu.SMEM)
            kern = functools.partial(_kernel_roll_hbm, K=K, group=group,
                                     win_rows=A.win_rows,
                                     interpret=interpret)
            wb3 = A.win_base.reshape(nsteps, 1, 1)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[scal_spec, scal_spec, wb_spec, wbn_spec,
                          pl.BlockSpec(memory_space=pltpu.ANY)]
                + [slot_spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), acc_dt),
                scratch_shapes=[pltpu.VMEM((A.win_rows, 128), xp2d.dtype),
                                pltpu.VMEM((A.win_rows, 128), xp2d.dtype),
                                pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA],
                interpret=interpret,
            )(_steps3(A), _steps3(A, True), wb3, wb3, xp2d, A.data)
        kern = functools.partial(_kernel_roll, K=K, group=group,
                                 interpret=interpret)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[scal_spec, scal_spec] + x_specs + [slot_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), acc_dt),
            interpret=interpret,
        )(_steps3(A), _steps3(A, True), xp2d, A.data)
    if (not interpret and A.win_base is not None
            and xp2d.size * xp2d.dtype.itemsize > _X_VMEM_BUDGET):
        nsteps = Tp // group
        wb_spec = pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.SMEM)
        wbn_spec = pl.BlockSpec(
            (1, 1, 1),
            lambda i, *_: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
            memory_space=pltpu.SMEM)
        kern = functools.partial(_kernel_hbm, K=K, group=group, nj=A.nj,
                                 win_rows=A.win_rows)
        wb3 = A.win_base.reshape(nsteps, 1, 1)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[scal_spec, scal_spec, wb_spec, wbn_spec,
                      pl.BlockSpec(memory_space=pltpu.ANY)]
            + [slot_spec, slot_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), acc_dt),
            scratch_shapes=[pltpu.VMEM((A.win_rows, 128), xp2d.dtype),
                            pltpu.VMEM((A.win_rows, 128), xp2d.dtype),
                            pltpu.SemaphoreType.DMA,
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(_steps3(A), _steps3(A, True), wb3, wb3, xp2d, A.data, A.uloc)
    kern = functools.partial(_kernel, K=K, group=group, nj=A.nj)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[scal_spec, scal_spec] + x_specs + [slot_spec, slot_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, 8, 128), acc_dt),
        interpret=interpret,
    )(_steps3(A), _steps3(A, True), xp2d, A.data, A.uloc)
    return y


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wjd_apply_ff(A: WJD, xh2d, xl2d, *, interpret=False):
    with jax.enable_x64(False):
        grid, scal_spec, x_specs, slot_spec, out_spec, Tp, K, group = _specs(
            A, [xh2d.shape, xl2d.shape])
        out32 = jax.ShapeDtypeStruct((Tp, 8, 128), jnp.float32)
        one_spec = pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                memory_space=pltpu.SMEM)
        one = jnp.ones((1, 1), jnp.float32)
        if A.kernel_mode == "roll":
            if (not interpret and A.win_base is not None
                    and 2 * xh2d.size * 4 > _X_VMEM_BUDGET):
                nsteps = Tp // group
                wb_spec = pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0),
                                       memory_space=pltpu.SMEM)
                wbn_spec = pl.BlockSpec(
                    (1, 1, 1),
                    lambda i, *_: (jnp.minimum(i + 1, nsteps - 1), 0, 0),
                    memory_space=pltpu.SMEM)
                kern = functools.partial(_kernel_roll_ff_hbm, K=K,
                                         group=group,
                                         win_rows=A.win_rows,
                                         interpret=interpret)
                wb3 = A.win_base.reshape(nsteps, 1, 1)
                return pl.pallas_call(
                    kern,
                    grid=grid,
                    in_specs=[scal_spec, scal_spec, wb_spec, wbn_spec,
                              one_spec,
                              pl.BlockSpec(memory_space=pltpu.ANY),
                              pl.BlockSpec(memory_space=pltpu.ANY),
                              slot_spec, slot_spec],
                    out_specs=(out_spec, out_spec),
                    out_shape=(out32, out32),
                    scratch_shapes=[
                        pltpu.VMEM((A.win_rows, 128), jnp.float32),
                        pltpu.VMEM((A.win_rows, 128), jnp.float32),
                        pltpu.VMEM((A.win_rows, 128), jnp.float32),
                        pltpu.VMEM((A.win_rows, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                    ],
                    interpret=interpret,
                )(_steps3(A), _steps3(A, True), wb3, wb3, one, xh2d, xl2d,
                  A.data, A.data_lo)
            kern = functools.partial(_kernel_roll_ff, K=K, group=group,
                                     interpret=interpret)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[scal_spec, scal_spec, one_spec] + x_specs
                + [slot_spec, slot_spec],
                out_specs=(out_spec, out_spec),
                out_shape=(out32, out32),
                interpret=interpret,
            )(_steps3(A), _steps3(A, True), one, xh2d, xl2d, A.data, A.data_lo)
        kern = functools.partial(_kernel_ff, K=K, group=group, nj=A.nj)
        yh, yl = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[scal_spec, scal_spec, one_spec] + x_specs
            + [slot_spec, slot_spec, slot_spec],
            out_specs=(out_spec, out_spec),
            out_shape=(out32, out32),
            interpret=interpret,
        )(_steps3(A), _steps3(A, True), one, xh2d, xl2d,
          A.data, A.data_lo, A.uloc)
        return yh, yl


def wjd_reference(A: WJD, x):
    """Reference slot-semantics SpMV in XLA's native arithmetic (f64 for
    float-float matrices) — the interpret-mode/CPU implementation and the
    oracle the kernels are tested against. Index identity: element (t,k,s,l)
    multiplies x_padded[(brow[t,k] + s)*128 + l + u[t,k,s,l]]."""
    n, m = A.shape
    ff = A.data_lo is not None
    xd = x.astype(jnp.float64) if ff else x
    pad_hi = A.xp_len - A.pad_lo - m
    xp = jnp.pad(xd, (A.pad_lo, pad_hi))
    val = A.data.astype(jnp.float64) + A.data_lo if ff else A.data
    Tp, K = A.brow.shape
    shape4 = (Tp, K, 8, 128)
    s = jax.lax.broadcasted_iota(jnp.int32, shape4, 2)
    l = jax.lax.broadcasted_iota(jnp.int32, shape4, 3)
    idx = ((A.brow[:, :, None, None] + s) * 128 + l
           + A.uloc_full.astype(jnp.int32))
    y = jnp.sum(val * xp[idx], axis=1).reshape(-1)[:n]
    if A.spill_row.shape[0]:
        prod = A.spill_val * xd[A.spill_col]
        y = y + jax.ops.segment_sum(prod, A.spill_row, num_segments=n)
    yd = _dia_apply(A, xd)
    return y if yd is None else y + yd


@functools.partial(jax.jit, static_argnames=("kc", "interpret"))
def _wjd_apply_mrhs(A: WJD, xp3d, *, kc, interpret=False):
    with jax.enable_x64(False):
        grid, scal_spec, x_specs, slot_spec, _, Tp, K, group = _specs(
            A, [xp3d.shape])
        kern = functools.partial(_kernel_mrhs, K=K, group=group, nj=A.nj,
                                 kc=kc)
        out_spec = pl.BlockSpec((kc, group, 8, 128),
                                lambda i, *_: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc_dt = (jnp.float32 if A.data.dtype == jnp.bfloat16
                  else A.data.dtype)
        y = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[scal_spec, scal_spec] + x_specs
            + [slot_spec, slot_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((kc, Tp, 8, 128), acc_dt),
            interpret=interpret,
        )(_steps3(A), _steps3(A, True), xp3d, A.data, A.uloc_full)
        return y


# multi-RHS x planes must stay VMEM-resident: cap their footprint
_MRHS_VMEM_BYTES = 8 * 2**20
_MRHS_MAX_COLS = 16


def wjd_spmm(A: WJD, X, *, interpret: bool | None = None):
    """Y = A @ X for X of shape (m, k) — blocked right-hand sides.

    Columns ride the batched-gather kernel in chunks sized to keep all x
    planes VMEM-resident; float-float (f64) matrices and oversized systems
    fall back to a per-column loop of the single-RHS path."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, m = A.shape
    k = X.shape[1]
    per_col = A.xp_len * 4
    chunk = max(1, min(_MRHS_MAX_COLS, _MRHS_VMEM_BYTES // max(per_col, 1)))
    if A.data_lo is not None or chunk == 1:
        return jnp.stack(
            [wjd_spmv(A, X[:, j], interpret=interpret) for j in range(k)],
            axis=1,
        )
    yd = _dia_apply(A, X)
    if A.nnz == 0 and A.spill_row.shape[0] == 0:
        return yd if yd is not None else jnp.zeros((n, k), X.dtype)
    pad_hi = A.xp_len - A.pad_lo - m
    outs = []
    for j0 in range(0, k, chunk):
        kc = min(chunk, k - j0)
        Xc = X[:, j0:j0 + kc]
        xp = jnp.pad(Xc, ((A.pad_lo, pad_hi), (0, 0)))      # (xp_len, kc)
        xp3d = xp.T.reshape(kc, A.xp_len // 128, 128)
        y = _wjd_apply_mrhs(A, xp3d, kc=kc, interpret=interpret)
        outs.append(y.reshape(kc, -1)[:, :n].T)             # (n, kc)
    y = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    if A.spill_row.shape[0]:
        prod = A.spill_val[:, None] * X[A.spill_col]
        y = y + jax.ops.segment_sum(prod, A.spill_row, num_segments=n)
    return y if yd is None else y + yd


def _dia_apply(A: WJD, x):
    """Hybrid split: apply the globally-dense diagonals through the fused
    XLA static-shift formulation (ops/spmv._spmv_dia — one pad, one fused
    VPU loop; the round-4 op-floor study shows this is ~2x the roll
    kernel's per-slot floor). Returns None when the split is absent."""
    if A.dia_data is None:
        return None
    from ...formats.dia import DIA
    from ..spmv import spmv as _spmv

    D = DIA(data=A.dia_data, offsets=A.dia_offsets, shape=A.shape)
    return _spmv(D, x)


def _pad_plane(A: WJD, x32):
    pad_hi = A.xp_len - A.pad_lo - A.shape[1]
    xp = jnp.pad(x32, (A.pad_lo, pad_hi))
    return xp.reshape(A.xp_len // 128, 128)


def wjd_spmv(A: WJD, x, *, interpret: bool | None = None):
    """y = A @ x for a WJD matrix; single right-hand side."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, _ = A.shape
    if A.data_lo is not None:
        if interpret:
            # CPU/interpret: native f64 IS available off-TPU — use the
            # reference slot formulation instead of emulating the f32
            # compensated kernel (whose error-free transformations XLA CPU's
            # unconditional fma contraction would break anyway).
            return wjd_reference(A, x)
        # float-float path: split x exactly into f32 hi + lo planes
        xd = x.astype(jnp.float64)
        xh = xd.astype(jnp.float32)
        xl = (xd - xh.astype(jnp.float64)).astype(jnp.float32)
        yh, yl = _wjd_apply_ff(A, _pad_plane(A, xh), _pad_plane(A, xl),
                               interpret=interpret)
        y = (yh.astype(jnp.float64) + yl.astype(jnp.float64)
             ).reshape(-1)[:n]
        if A.spill_row.shape[0]:
            prod = A.spill_val * xd[A.spill_col]
            y = y + jax.ops.segment_sum(prod, A.spill_row, num_segments=n)
        return y
    yd = _dia_apply(A, x)
    if A.nnz == 0 and A.spill_row.shape[0] == 0:
        return yd if yd is not None else jnp.zeros((n,), x.dtype)
    y = _wjd_apply(A, _pad_plane(A, x), interpret=interpret).reshape(-1)[:n]
    if A.spill_row.shape[0]:
        prod = A.spill_val * x[A.spill_col]
        y = y + jax.ops.segment_sum(prod, A.spill_row, num_segments=n)
    return y if yd is None else y + yd
