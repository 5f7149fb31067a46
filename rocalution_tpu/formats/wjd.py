"""WJD — windowed jagged-diagonal storage, the TPU-fast sparse format.

This is the TPU-native answer to the reference's optimized device kernel
layer (rocSPARSE csrmv behind HIPAcceleratorMatrixCSR::Apply,
src/base/hip/hip_matrix_csr.cpp:1215-1276, and the hand-written kernels in
src/base/hip/hip_kernels_csr.hpp). A GPU handles CSR's irregular column
gather with SIMT threads; a TPU cannot — its fast primitive is the 8x128
vector register plus `tpu.dynamic_gather` (a lane-shuffle within one vreg,
measured ~7.6 ns/vreg on v5e). WJD reshapes an arbitrary sparse matrix so
SpMV uses exactly that primitive:

* Rows are grouped into **tiles of 1024** laid out as one (8, 128) vreg
  (row i -> tile t = i//1024, sublane s = (i//128)%8, lane l = i%128).
* Within a tile, every nonzero is keyed by its diagonal offset
  d = col - row and bucketed into **windows** of `win` consecutive offsets
  (window id w = d >> wlog, local offset u = d - win*w in [0, win)).
* The entries of one (tile, window, rank) triple form a **slot**: an
  (8, 128) vreg of values + an (8, 128) vreg of local offsets u, where
  `rank` numbers multiple hits of the same window by one row. Rows lacking
  an entry pad with value 0 (u = 0 gathers a harmless in-window element).
* Per slot, one scalar `brow` gives the 128-aligned first row of the x
  window: x[col] = xwin[s + (l+u)//128, (l+u)%128], and since
  u < win the row correction (l+u)//128 takes only nj = win/128 + 1
  values — the whole gather is nj lane-shuffles plus selects, no scatter
  (each product lands at its row's own (s, l) position; accumulation is
  a vreg add).

The kernel streams (values, u) from HBM while x stays VMEM-resident.
Measured on v5e: 52 Gnnz/s (419 GB/s by the reference's 8-byte/nnz model,
~51% of HBM roofline) on the 1M-row 3D Laplacian in CSR-equivalent form —
vs 0.5 GB/s for XLA's gather-based CSR path.

The window width trades gather count (nj per slot) against slot padding
(union of windows over a tile's 1024 rows): narrow windows suit banded
matrices, wide windows suit scattered ones. ``wlog="auto"`` measures the
padding at width 256 and widens if it pays.

**Roll mode** (round 3): when the cost model favors it, slots are keyed by
(tile, DIAGONAL) instead of (tile, window, rank) — true jagged-diagonal
storage. Every slot then has ONE offset u, so the kernel replaces the nj
lane-gathers with a single dynamic lane-rotate (tpu.dynamic_rotate) of the
x window and never streams the uloc plane: bytes/value drop to DIA's level
while still serving arbitrary CSR input (off-band entries ride the COO
spill). Stencil/banded matrices — the dominant solver workload — take this
path automatically; scattered matrices keep gather mode (their diagonal
count would explode the slot grid).

Conversion is a pure host-side numpy pass (vectorized, no per-row Python
loops) — the analog of the reference's format ConvertTo + rocsparse
csrmv_analysis setup stage, reported separately as `time_analyze`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import MatrixBase, register_format, static_field

TILE = 1024          # rows per tile: one (8, 128) f32 vreg


def _load_rows(nj: int) -> int:
    """Sublane rows the kernel loads per window (see spmv_wjd kernel)."""
    return -(-(8 + nj) // 8) * 8


def nj_of(wlog: int) -> int:
    """Gather candidates per slot for a window of 2**wlog."""
    return (1 << wlog) // 128 + 1


@register_format
@dataclasses.dataclass(frozen=True)
class WJD(MatrixBase):
    """Windowed jagged-diagonal matrix (see module docstring)."""

    data: jnp.ndarray        # (T, K, 8, 128) values (slot vregs)
    brow: jnp.ndarray        # (T, K) int32 window base row into padded x
    diag_u: jnp.ndarray      # (T, K) int32: constant u for diagonal slots, -1 else
    spill_row: jnp.ndarray   # (nspill,) int32 COO spill (rows beyond slot cap)
    spill_col: jnp.ndarray   # (nspill,) int32
    spill_val: jnp.ndarray   # (nspill,)
    # float-float (f64) extension: data holds the f32 hi halves, data_lo the
    # f32 lo halves (v = hi + lo exactly); None for native-f32/bf16 matrices.
    # The kernel then runs Dekker two-products + compensated accumulation
    # (see ops/pallas/spmv_wjd.py) — the TPU answer to the reference's
    # natively-double csrmv (hip_matrix_csr.cpp:1215-1276).
    data_lo: Optional[jnp.ndarray] = None
    # (T, K, 8, 128) local offsets in [0, win); uint8 when win <= 256,
    # else int16. None for ROLL-mode plans: there uloc is exactly
    # diag_u broadcast over the vreg (one offset per slot by
    # construction), so storing/uploading it would be ~20% dead operand
    # weight (235 MB at 16.7M f64) — `uloc_full` reconstructs on demand.
    uloc: Optional[jnp.ndarray] = None
    # roll mode only: per-grid-step first x row of the step's window
    # ((nsteps,) int32; local slot base = brow - win_base[step]). Lets the
    # kernel keep x in HBM and DMA only a (win_rows, 128) window per step —
    # without it the whole padded x must be VMEM-resident, which caps a
    # single chip at ~4M rows (scoped-VMEM limit, measured at 16.7M).
    win_base: Optional[jnp.ndarray] = None
    # hybrid DIA split: GLOBALLY dense diagonals are pulled out of the slot
    # plan and served by the fused XLA static-shift formulation (round-4
    # op-floor study: Mosaic's rotate costs the same static or dynamic, but
    # XLA's fully-static DIA closure reaches ~4 ops/diag/vreg — 2x the roll
    # kernel). dia_data[k, r] = A[r, r + dia_offsets[k]] (zero-filled
    # holes); the kernel serves only the residual slots. Analog: the
    # reference's HYB ELL+COO split, re-targeted at diagonals.
    dia_data: Optional[jnp.ndarray] = None
    dia_offsets: Tuple[int, ...] = static_field(default=())
    shape: Tuple[int, int] = static_field(default=(0, 0))
    value_dtype: str = static_field(default="float32")  # logical value dtype
    # "gather": nj lane-shuffles per slot (general sparsity).
    # "roll": every slot has ONE diagonal offset u (banded/stencil
    # matrices; off-mode entries were spilled at conversion) — the column
    # resolve is a single dynamic lane-rotate of the x window and the
    # uloc plane is not streamed at all (~2x less traffic + fewer ops).
    kernel_mode: str = static_field(default="gather")
    pad_lo: int = static_field(default=0)    # zeros prepended to x
    xp_len: int = static_field(default=0)    # padded x length (multiple of 128)
    nnz: int = static_field(default=0)
    group: int = static_field(default=8)     # tiles per kernel grid step
    wlog: int = static_field(default=8)      # log2 window width
    win_rows: int = static_field(default=0)  # x rows per step window (roll)

    @property
    def uloc_full(self):
        """uloc plane, reconstructing the roll-mode broadcast on demand."""
        if self.uloc is not None:
            return self.uloc
        Tp, K = self.brow.shape
        dt = jnp.uint8 if (1 << self.wlog) <= 256 else jnp.int16
        du = jnp.maximum(self.diag_u, 0).astype(dt)
        return jnp.broadcast_to(du[:, :, None, None], (Tp, K, 8, 128))

    @property
    def nj(self) -> int:
        """Gather candidates per slot: (l + u) >> 7 in [0, nj)."""
        return (1 << self.wlog) // 128 + 1

    @property
    def dtype(self):
        """Logical value dtype (float64 for the float-float variant)."""
        return jnp.dtype(self.value_dtype)

    @property
    def padding_ratio(self) -> float:
        Tp, K = self.brow.shape
        return Tp * K * TILE / max(self.nnz, 1)


# per-slot kernel cost model (ns, v5e-measured): base + gathers; spilled
# entries pay the XLA segment-sum rate (~25 ns/nnz measured round 1).
# The float-float (f64) kernel gathers BOTH x planes and runs ~20 extra
# VPU ops of compensated arithmetic per slot; its spill rides emulated-f64
# XLA (~2x).
_COST_BASE = 12.0
_COST_GATHER = 7.6
_COST_SPILL = 25.0
_FF_COST_BASE = 32.0
_FF_COST_SPILL = 50.0
# roll-mode slots: no gathers, no uloc streaming — 2 window loads +
# 2 lane-rotates + select (estimates pending hardware recalibration)
_COST_ROLL = 10.0
_FF_COST_ROLL = 18.0


def csr_to_wjd(vals, cols, indptr, shape, *, wlog="auto",
               max_slots: Optional[int] = 128,
               kernel_mode: str = "auto",
               values_dtype=None, cache: bool = True,
               split_dia="auto", device: bool = True) -> WJD:
    """Host-side CSR -> WJD conversion (vectorized numpy, setup phase).
    Thin wrapper: plan (or load the cached plan — see wjd_cache.py) then
    materialize device arrays once at the end (``device=False``: numpy
    leaves, see _plan_to_wjd)."""
    return _plan_to_wjd(csr_to_wjd_plan(
        vals, cols, indptr, shape, wlog=wlog, max_slots=max_slots,
        kernel_mode=kernel_mode, values_dtype=values_dtype, cache=cache,
        split_dia=split_dia), device=device)


def csr_to_wjd_plan(vals, cols, indptr, shape, *, wlog="auto",
                    max_slots: Optional[int] = 128,
                    kernel_mode: str = "auto",
                    values_dtype=None, cache: bool = True,
                    split_dia="auto") -> dict:
    """Host-side CSR -> WJD *plan* (numpy arrays + static fields only —
    no device arrays; see `_plan_to_wjd`). The analysis stage proper.

    ``values_dtype="bfloat16"``: store the slot values (and spill) in
    bfloat16 — half the matrix bytes, accumulation stays f32 in the kernel
    (~1e-3 relative accuracy). A TPU-native capability with no reference
    counterpart (rocSPARSE csrmv is f32/f64 only); intended for the inner
    operator of MixedPrecisionDC or accuracy-tolerant smoother applies.

    ``max_slots`` caps slots per tile; entries in hotter slots spill to a
    COO tail handled by the XLA segment-sum path (the HYB ELL+COO split of
    the reference, matrix_formats.hpp:127-136, re-targeted at tile slots).

    ``kernel_mode``: "gather" | "roll" | "auto". Roll slots are keyed by
    (tile, DIAGONAL) — true jagged-diagonal storage with holes — so every
    slot has one offset, the kernel resolves columns with a single dynamic
    lane-rotate, and the uloc plane is never streamed. Stencil/banded
    matrices get this for free (slot count = diagonals per tile, zero
    extra spill); scattered matrices stay in gather mode (slot count would
    explode). "auto" picks by the per-slot cost model.

    ``cache``: persist/reuse the finished plan on disk keyed by a content
    hash of the triplet + options (wjd_cache.py) — the csrmv-analysis cost
    is then paid once per machine, not once per process.
    """
    n, m = int(shape[0]), int(shape[1])
    vals = np.asarray(vals)
    cols = np.asarray(cols, dtype=np.int64)
    indptr = np.asarray(indptr, dtype=np.int64)
    nnz = len(vals)

    key = None
    if cache and nnz >= 100_000:          # small plans replan faster than IO
        from . import wjd_cache

        key = wjd_cache.plan_key(vals, cols, indptr, shape, {
            "wlog": wlog, "max_slots": max_slots,
            "kernel_mode": kernel_mode, "values_dtype": values_dtype,
            "split_dia": split_dia,
        })
        hit = wjd_cache.load_plan(key)
        if hit is not None:
            return hit

    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))

    # hybrid DIA split (round-4 VERDICT item 10): GLOBALLY dense diagonals
    # leave the slot plan and ride XLA's fully-static DIA formulation
    # (~4 ops/diag/vreg vs the roll kernel's ~12.6 ns/slot floor — Mosaic
    # rotates cost the same static or dynamic, measured; BASELINE.md
    # op-floor study). f32/bf16 only: the ff (f64) kernel keeps its exact
    # compensated path.
    dia_data = None
    dia_offsets = ()
    do_split = (split_dia if split_dia != "auto"
                else np.dtype(vals.dtype) == np.float32)
    if do_split and nnz:
        d_all = cols - rows
        offs_u, counts = np.unique(d_all, return_counts=True)
        qual = offs_u[counts >= max(1, n // 2)]
        if len(qual) > 64:           # bound the (ndiag, n) side structure
            top = np.argsort(counts[np.isin(offs_u, qual)])[-64:]
            qual = np.sort(qual[top])
        if len(qual):
            mask = np.isin(d_all, qual)
            dia_offsets = tuple(int(o) for o in qual)
            dia_data = np.zeros((len(qual), n), vals.dtype)
            ki = np.searchsorted(qual, d_all[mask])
            dia_data[ki, rows[mask]] = vals[mask]
            keep = ~mask
            vals, cols, rows = vals[keep], cols[keep], rows[keep]
            nnz = len(vals)

    def _finish(plan_out):
        if dia_data is not None and values_dtype is not None and                 jnp.dtype(values_dtype) == jnp.bfloat16:
            import ml_dtypes

            plan_out["dia_data"] = dia_data.astype(ml_dtypes.bfloat16)
        else:
            plan_out["dia_data"] = dia_data
        plan_out["dia_offsets"] = dia_offsets
        if key is not None:
            from . import wjd_cache

            wjd_cache.save_plan(key, plan_out)
        return plan_out

    if nnz == 0:
        empty = np.zeros(0, np.int64)
        return _finish(_assemble(
            vals, empty, empty, empty, empty, 1, n, m, 0, 8,
            spill=(empty, empty, vals), slot_info=None))

    d = cols - rows
    t = rows >> 10

    T = max(1, -(-n // TILE))

    def plan(wl):
        wid = d >> wl                    # arithmetic shift: floor(d / win)
        # rank of each entry within its (row, window) run. CSR stores
        # columns sorted per row, so (row, wid) groups are contiguous runs.
        new_run = np.ones(nnz, dtype=bool)
        new_run[1:] = (rows[1:] != rows[:-1]) | (wid[1:] != wid[:-1])
        run_id = np.cumsum(new_run) - 1
        run_first = np.flatnonzero(new_run)
        rank = np.arange(nnz, dtype=np.int64) - run_first[run_id]
        wmin = int(wid.min())
        wspan = int(wid.max()) - wmin + 1
        rspan = int(rank.max()) + 1
        enc = (t * wspan + (wid - wmin)) * rspan + rank
        slot_enc, inv = np.unique(enc, return_inverse=True)
        slot_t = slot_enc // (wspan * rspan)
        slot_wid = (slot_enc // rspan) % wspan + wmin
        tile_first = np.searchsorted(slot_t, np.arange(T, dtype=np.int64))
        k_of_slot = (np.arange(len(slot_enc), dtype=np.int64)
                     - tile_first[slot_t])
        return wid, slot_t, slot_wid, k_of_slot, inv

    def cost_of(wl, p):
        """Estimated apply time (ns) with the best per-tile slot cap.

        The kernel streams T*K slot vregs regardless of occupancy, so ONE
        hot tile (e.g. a boundary row with clustered columns) would pad
        every other tile; pick the cap K minimizing
            T * K * slot_cost + (entries in slots with k >= K) * spill_cost
        over the k-index entry histogram — hot-tile tails go to COO spill.
        """
        _, _, _, k_of_slot, inv = p
        nj = (1 << wl) // 128 + 1
        ff = np.dtype(vals.dtype) == np.float64
        slot_cost = ((_FF_COST_BASE + 2 * nj * _COST_GATHER) if ff
                     else (_COST_BASE + nj * _COST_GATHER))
        spill_cost = _FF_COST_SPILL if ff else _COST_SPILL
        kmax = int(k_of_slot.max()) + 1
        hist = np.bincount(k_of_slot[inv], minlength=kmax).astype(np.int64)
        suffix = np.concatenate([np.cumsum(hist[::-1])[::-1], [0]])
        caps = np.arange(1, kmax + 1)
        costs = T * caps * slot_cost + suffix[caps] * spill_cost
        best_i = int(np.argmin(costs))
        cap = int(caps[best_i])
        if max_slots is not None and cap > max_slots:
            cap = max_slots
        cost = float(T * cap * slot_cost + suffix[cap] * spill_cost)
        return cost, cap

    def plan_roll(wl):
        """Slots keyed by (tile, diagonal): jagged-diagonal layout. Rank is
        identically 0 — one slot per distinct diagonal per tile."""
        dmin = int(d.min())
        dspan = int(d.max()) - dmin + 1
        enc = t * dspan + (d - dmin)
        slot_enc, inv_r = np.unique(enc, return_inverse=True)
        slot_t_r = slot_enc // dspan
        slot_d = slot_enc % dspan + dmin
        tile_first = np.searchsorted(slot_t_r, np.arange(T, dtype=np.int64))
        k_of_slot_r = (np.arange(len(slot_enc), dtype=np.int64)
                       - tile_first[slot_t_r])
        return (slot_d >> wl, slot_t_r, slot_d >> wl, k_of_slot_r, inv_r,
                slot_d)

    def cap_cost(k_of_slot_, inv_, slot_cost, spill_cost):
        kmax = int(k_of_slot_.max()) + 1
        hist = np.bincount(k_of_slot_[inv_], minlength=kmax).astype(np.int64)
        suffix = np.concatenate([np.cumsum(hist[::-1])[::-1], [0]])
        caps = np.arange(1, kmax + 1)
        costs = T * caps * slot_cost + suffix[caps] * spill_cost
        best_i = int(np.argmin(costs))
        cap = int(caps[best_i])
        if max_slots is not None and cap > max_slots:
            cap = max_slots
        return float(T * cap * slot_cost + suffix[cap] * spill_cost), cap

    ff_vals = np.dtype(vals.dtype) == np.float64
    spill_c = _FF_COST_SPILL if ff_vals else _COST_SPILL
    roll_c = _FF_COST_ROLL if ff_vals else _COST_ROLL

    # roll candidate FIRST (diagonal slots, fixed 256-wide windows): when a
    # matrix is clearly banded — few diagonal slots, negligible spill — the
    # roll plan always wins the cost model, so the (more expensive) gather
    # planning sweep is skipped entirely. Single-pass auto analysis.
    cost_r = cap_r = plan_r = None
    if kernel_mode != "gather":
        wl_r = 8 if wlog == "auto" else int(wlog)
        plan_r = plan_roll(wl_r)
        cost_r, cap_r = cap_cost(plan_r[3], plan_r[4], roll_c, spill_c)

    clearly_banded = (
        kernel_mode == "auto" and cap_r is not None and cap_r <= 12
        and cost_r <= 1.05 * (T * cap_r * roll_c)   # spill share tiny
    )

    # gather candidate (window/rank slots, auto window width)
    cost_g = cap_g = plan_g = wl_g = None
    if kernel_mode != "roll" and not clearly_banded:
        best = None
        wls = (8, 10, 11) if wlog == "auto" else (wlog,)
        for wl in wls:
            p = plan(wl)
            c, cap = cost_of(wl, p)
            if best is None or c < best[0]:
                best = (c, wl, cap, p)
            if wlog == "auto" and len(p[3]) * TILE < 2 * nnz:
                break                        # already tight: stop widening
        cost_g, wl_g, cap_g, plan_g = best

    if kernel_mode == "roll" or (kernel_mode == "auto"
                                 and cost_r is not None
                                 and (cost_g is None or cost_r < cost_g)):
        kernel_mode = "roll"
        wlog = 8 if wlog == "auto" else int(wlog)
        wid, slot_t, slot_wid, k_of_slot, inv, slot_d = plan_r
        cap = cap_r
        # per-entry wid for the u computation below
        wid = d >> wlog
    else:
        kernel_mode = "gather"
        wlog = wl_g
        cap = cap_g
        wid, slot_t, slot_wid, k_of_slot, inv = plan_g
        slot_d = None

    k_of_entry = k_of_slot[inv]
    u = (d - (wid << wlog)).astype(np.int64)       # in [0, win)

    # spill entries in slots beyond the cap
    if int(k_of_slot.max()) + 1 > cap:
        keep_slot = k_of_slot < cap
        keep = keep_slot[inv]
        spill = (rows[~keep], cols[~keep], vals[~keep])
        sel = np.flatnonzero(keep)
        rows_k, vals_k, u_k = rows[sel], vals[sel], u[sel]
        t_k, k_e = t[sel], k_of_entry[sel]
        slot_sel = np.flatnonzero(keep_slot)
        slot_t, slot_wid = slot_t[slot_sel], slot_wid[slot_sel]
        k_of_slot = k_of_slot[slot_sel]
        if slot_d is not None:
            slot_d = slot_d[slot_sel]
        K = cap
    else:
        spill = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                 np.zeros(0, vals.dtype))
        rows_k, vals_k, u_k, t_k, k_e = rows, vals, u, t, k_of_entry
        K = int(k_of_slot.max()) + 1

    # roll mode: per-slot diagonal offset (constant by construction)
    mode_u = None
    if kernel_mode == "roll":
        mode_u = np.zeros(T * K, np.int64)
        mode_u[slot_t * K + k_of_slot] = slot_d - (slot_wid << wlog)

    plan_out = _assemble(vals_k, rows_k, u_k, t_k, k_e, K, n, m, nnz, wlog,
                         spill=spill,
                         slot_info=(slot_t, slot_wid, k_of_slot),
                         kernel_mode=kernel_mode, mode_u=mode_u,
                         values_dtype=values_dtype)
    return _finish(plan_out)


# single source of truth for the x-plane VMEM budget (the pallas layer
# imports it): above this the roll kernel windows x from HBM per step
X_VMEM_BUDGET = 12 << 20


def _auto_group(K: int) -> int:
    """Tiles per grid step: enough slots per step to amortize grid overhead,
    small enough to keep the double-buffered slot blocks in VMEM."""
    return max(1, min(8, 256 // max(K, 1)))


def _auto_group_windowed(K: int) -> int:
    """Tiles per grid step in the HBM-x windowed regime: each step re-DMAs
    a band-wide x window, so MORE tiles per step amortize it (group 8
    advances 64 rows under a ~1.1k-row window -> ~17x x re-fetch, measured
    224 GB/s at 16.7M; group 64 cuts the amplification to ~3x). Slot
    blocks stay VMEM-safe: 64*K*4 KiB <= ~2 MiB for roll-mode K."""
    return max(_auto_group(K), min(64, max(8, 512 // max(K, 1))))


def _assemble(vals_k, rows_k, u_k, t_k, k_e, K, n, m, nnz, wlog,
              *, spill, slot_info=None, kernel_mode="gather", mode_u=None,
              values_dtype=None):
    win = 1 << wlog
    nj = win // 128 + 1
    group = _auto_group(K)
    if int(m) * 4 > X_VMEM_BUDGET:
        group = _auto_group_windowed(K)   # HBM-x windowed regime
    T = max(1, -(-n // TILE))
    Tp = -(-T // group) * group

    dtype = vals_k.dtype if vals_k.size else np.asarray(spill[2]).dtype
    udtype = np.uint8 if win <= 256 else np.int16
    val_arr = np.zeros((Tp, K, 8, 128), dtype=dtype)
    u_arr = np.zeros((Tp, K, 8, 128), dtype=np.int32)
    brow_arr = np.zeros((Tp, K), dtype=np.int64)
    diag_arr = np.full((Tp, K), -1, dtype=np.int32)

    if slot_info is not None and len(vals_k):
        slot_t, slot_wid, k_of_slot = slot_info
        s = (rows_k >> 7) & 7
        l = rows_k & 127
        val_arr[t_k, k_e, s, l] = vals_k
        u_arr[t_k, k_e, s, l] = u_k

        b = slot_t * TILE + (slot_wid << wlog)       # 128-aligned, may be <0
        pad_lo = int(max(0, -(b.min())))
        pad_lo = -(-pad_lo // 128) * 128
        brow_arr[slot_t, k_of_slot] = (b + pad_lo) >> 7

        if kernel_mode == "roll":
            # every slot was forced to one u at conversion: diag_u = that
            # offset (0 for empty slots — value vreg is all zero there)
            diag_arr = np.zeros((Tp, K), np.int32)
            mu = mode_u.reshape(-1, K)[: Tp] if mode_u is not None else None
            if mu is not None:
                diag_arr[: mu.shape[0]] = mu.astype(np.int32)
            occ = np.zeros((Tp, K, 8, 128), dtype=bool)
            occ[t_k, k_e, s, l] = True
            u_arr = np.where(occ, u_arr,
                             diag_arr[:, :, None, None]).astype(np.int32)
        else:
            # diagonal slots: every REAL entry shares one u -> pad holes
            # with it so a kernel may take a gather-free roll path.
            occ = np.zeros((Tp, K, 8, 128), dtype=bool)
            occ[t_k, k_e, s, l] = True
            u_masked = np.where(occ, u_arr, -1)
            u_max = u_masked.reshape(Tp, K, -1).max(axis=2)
            u_min_real = np.where(occ, u_arr, win).reshape(
                Tp, K, -1).min(axis=2)
            is_diag = (u_max == u_min_real) & (u_max >= 0)
            diag_arr = np.where(is_diag, u_max, -1).astype(np.int32)
            fill = np.broadcast_to(np.maximum(u_max, 0)[:, :, None, None],
                                   u_arr.shape)
            u_arr = np.where(occ, u_arr, np.where(is_diag[:, :, None, None],
                                                  fill, 0)).astype(np.int32)

        max_brow = int(brow_arr.max())

        # Per-grid-step x windows (HBM-x kernel variants, BOTH modes):
        # window base = min REAL brow in the step; EMPTY slots (brow left
        # 0 at scatter) are re-based to that minimum so their harmless
        # loads stay inside the step's window. win_rows covers the
        # deepest load (+17 rows for roll's 16-row load at brow+(du>>7);
        # _load_rows(nj) for gather).
        nsteps = Tp // group
        real = np.zeros((Tp, K), dtype=bool)
        real[slot_t, k_of_slot] = True
        b3 = brow_arr.reshape(nsteps, group, K)
        r3 = real.reshape(nsteps, group, K)
        BIG = np.int64(1) << 40
        bmin = np.where(r3, b3, BIG).reshape(nsteps, -1).min(axis=1)
        bsup = np.where(r3, b3, -1).reshape(nsteps, -1).max(axis=1)
        empty_step = bmin >= BIG
        bmin = np.where(empty_step, 0, bmin)
        bsup = np.maximum(bsup, bmin)
        brow_arr = np.where(
            r3, b3, bmin[:, None, None]).reshape(Tp, K)
        win_base = bmin.astype(np.int32)
        load_need_w = _load_rows(nj) + (8 if kernel_mode == "roll" else 0)
        win_rows = int((bsup - bmin).max()) + load_need_w
        win_rows = -(-win_rows // 8) * 8 + 8
    else:
        pad_lo = 0
        max_brow = 0
        win_base = None
        win_rows = 0
        real = np.zeros((Tp, K), dtype=bool)

    # padded x must cover the deepest window load: rows [brow, brow+load_rows)
    # (roll kernel: one 16-row load at brow + (du>>7) with du>>7 <= 1 -> 17
    # rows past brow; +8 margin keeps it sublane-aligned)
    load_need = _load_rows(nj) + (8 if kernel_mode == "roll" else 0)
    need_rows = max_brow + load_need
    if win_base is not None and len(win_base):
        # the HBM-x variant copies [win_base, win_base + win_rows) per step
        need_rows = max(need_rows, int(win_base.max()) + win_rows)
    xp_len = max(need_rows * 128, -(-(pad_lo + m) // 128) * 128)
    sr, sc, sv = spill

    # float-float split for f64 values: hi = f32(v), lo = f32(v - hi) —
    # exact (v = hi + lo); the kernel reconstitutes ~48-bit products.
    val_lo = None
    value_dtype = np.dtype(dtype).name
    if values_dtype is not None and jnp.dtype(values_dtype) == jnp.bfloat16:
        import ml_dtypes

        val_arr = val_arr.astype(ml_dtypes.bfloat16)
        sr, sc, sv = sr, sc, np.asarray(sv).astype(ml_dtypes.bfloat16)
        value_dtype = "bfloat16"
    elif np.dtype(dtype) == np.float64:
        hi = val_arr.astype(np.float32)
        val_lo = (val_arr - hi.astype(np.float64)).astype(np.float32)
        val_arr = hi
    return dict(
        data=val_arr,
        data_lo=val_lo,
        uloc=None if kernel_mode == "roll" else u_arr.astype(udtype),
        brow=brow_arr.astype(np.int32),
        diag_u=diag_arr,
        win_base=win_base,
        win_rows=int(win_rows),
        real=real,
        dia_data=None,
        dia_offsets=(),
        spill_row=np.asarray(sr, dtype=np.int32),
        spill_col=np.asarray(sc, dtype=np.int32),
        spill_val=np.asarray(sv),
        shape=(n, m),
        pad_lo=int(pad_lo),
        xp_len=int(xp_len),
        nnz=int(nnz),
        group=int(group),
        wlog=int(wlog),
        value_dtype=value_dtype,
        kernel_mode=kernel_mode,
    )


def _plan_to_wjd(plan: dict, device: bool = True) -> WJD:
    """Materialize a host plan as the WJD pytree (one upload per array;
    the only jnp construction on the conversion path). ``device=False``
    keeps numpy leaves: for operands consumed only INSIDE jitted solver
    bodies (tri-solve factors), where they embed as compile-time
    constants — on the 5 MB/s relay an eager upload at analyze time
    would be paid again by the compile anyway."""
    wb = plan.get("win_base")
    put = jnp.asarray if device else np.asarray

    def puti(a, dt):
        return (jnp.asarray(a, dtype=dt) if device
                else np.asarray(a, dtype=dt))

    return WJD(
        data=put(plan["data"]),
        data_lo=(None if plan["data_lo"] is None
                 else put(plan["data_lo"])),
        uloc=(None if plan.get("uloc") is None
              else put(plan["uloc"])),
        brow=puti(plan["brow"], np.int32),
        diag_u=put(plan["diag_u"]),
        win_base=None if wb is None else puti(wb, np.int32),
        win_rows=int(plan.get("win_rows", 0)),
        dia_data=(None if plan.get("dia_data") is None
                  else put(plan["dia_data"])),
        dia_offsets=tuple(plan.get("dia_offsets", ())),
        spill_row=puti(plan["spill_row"], np.int32),
        spill_col=puti(plan["spill_col"], np.int32),
        spill_val=put(plan["spill_val"]),
        shape=tuple(plan["shape"]),
        pad_lo=int(plan["pad_lo"]),
        xp_len=int(plan["xp_len"]),
        nnz=int(plan["nnz"]),
        group=int(plan["group"]),
        wlog=int(plan["wlog"]),
        value_dtype=plan["value_dtype"],
        kernel_mode=plan["kernel_mode"],
    )


class ComplexWJD(NamedTuple):
    """Complex fast-apply = two real WJD planes (re, im): the TPU answer
    to the reference's c/z csrmv instantiations (hip_sparse.hpp
    rocsparseCcsrmv/Zcsrmv). y = (Ar x_r - Ai x_i) + i(Ar x_i + Ai x_r);
    complex64 rides the f32 kernel, complex128 the float-float kernel."""

    re: WJD
    im: WJD
    value_dtype: str


def from_csr(A, **kwargs):
    """Convert a CSR pytree (host-built) to WJD (ComplexWJD for complex
    values)."""
    d, i, p = A.numpy_triplet()
    if np.iscomplexobj(d):
        real_dt = np.float64 if d.dtype == np.complex128 else np.float32
        return ComplexWJD(
            re=csr_to_wjd(np.ascontiguousarray(d.real).astype(real_dt),
                          i, p, A.shape, **kwargs),
            im=csr_to_wjd(np.ascontiguousarray(d.imag).astype(real_dt),
                          i, p, A.shape, **kwargs),
            value_dtype=np.dtype(d.dtype).name,
        )
    return csr_to_wjd(d, i, p, A.shape, **kwargs)


def stack_wjd(parts, shape, *, wlog=None, max_slots: Optional[int] = 128) -> WJD:
    """Convert P same-shape CSR triplets to ONE WJD whose arrays carry a
    leading (P,) axis and whose static fields (K, wlog, group, pads) are
    unified across parts — the per-shard fast-apply operand consumed inside
    `shard_map` (parallel/ops.shard_spmv). The analog of the reference
    running the SAME optimized csrmv on every rank's interior matrix
    (global_matrix.cpp:976-1007).

    `parts`: list of (vals, cols, indptr) host triplets. Part 0's auto
    window choice fixes `wlog` for all parts (uniform nj ⇒ one kernel).

    Works entirely on host PLANS (csr_to_wjd_plan) — device arrays are
    created once at the end, never read back."""
    ws = []
    wl = wlog
    kmode = None
    for (v, c, p) in parts:
        w = csr_to_wjd_plan(v, c, p, shape,
                            wlog=(wl if wl is not None else "auto"),
                            max_slots=max_slots,
                            kernel_mode=(kmode or "auto"),
                            split_dia=False)
        if wl is None:
            wl = w["wlog"]
        if kmode is None:
            kmode = w["kernel_mode"]   # part 0 decides for every part
        ws.append(w)

    P = len(ws)
    n, m = int(shape[0]), int(shape[1])
    K = max(w["brow"].shape[1] for w in ws)
    # beyond-VMEM per-shard x planes take the HBM-x windowed kernels, whose
    # group sizing amortizes the per-step window DMA (round-4 weakness 4:
    # stack_wjd never set win_base, so >~3M-row shards fell off the fast
    # path exactly where multi-chip is supposed to take over)
    windowed = int(m) * 4 > X_VMEM_BUDGET
    group = _auto_group_windowed(K) if windowed else _auto_group(K)
    T = max(1, -(-n // TILE))
    Tp = -(-T // group) * group
    pad_lo = -(-max(w["pad_lo"] for w in ws) // 128) * 128
    nj = (1 << wl) // 128 + 1
    # padded-x length must cover every part's deepest (shifted) window
    # load (+8 rows for the roll kernel's single 16-row load, see
    # csr_to_wjd_plan)
    load_need = _load_rows(nj) + (8 if kmode == "roll" else 0)
    xp_len = max(
        max((int(w["brow"].max()) + (pad_lo - w["pad_lo"]) // 128
             + load_need) * 128 for w in ws),
        -(-(pad_lo + m) // 128) * 128,
    )
    nspill = max(w["spill_row"].shape[0] for w in ws)
    ff = ws[0]["data_lo"] is not None
    vdtype = ws[0]["data"].dtype

    def alloc(shp, dtype, fill=0):
        return np.full((P,) + shp, fill, dtype=dtype)

    data = alloc((Tp, K, 8, 128), vdtype)
    dlo = alloc((Tp, K, 8, 128), vdtype) if ff else None
    uloc = (None if ws[0]["uloc"] is None
            else alloc((Tp, K, 8, 128), ws[0]["uloc"].dtype))
    brow = alloc((Tp, K), np.int64)
    real = alloc((Tp, K), bool)
    # roll mode reads diag_u unconditionally: pad slots must be 0, not -1
    diag = alloc((Tp, K), np.int32, fill=(0 if kmode == "roll" else -1))
    sr = alloc((nspill,), np.int32)
    sc = alloc((nspill,), np.int32)
    sv = alloc((nspill,), ws[0]["spill_val"].dtype)

    for q, w in enumerate(ws):
        Tq, Kq = w["brow"].shape
        tq, kq = min(Tq, Tp), Kq
        data[q, :tq, :kq] = w["data"][:tq]
        if ff:
            dlo[q, :tq, :kq] = w["data_lo"][:tq]
        if uloc is not None:
            uloc[q, :tq, :kq] = w["uloc"][:tq]
        brow[q, :tq, :kq] = (w["brow"][:tq]
                             + (pad_lo - w["pad_lo"]) // 128)
        real[q, :tq, :kq] = w["real"][:tq]
        diag[q, :tq, :kq] = w["diag_u"][:tq]
        ns = w["spill_row"].shape[0]
        if ns:
            sr[q, :ns] = w["spill_row"]
            sc[q, :ns] = w["spill_col"]
            sv[q, :ns] = w["spill_val"]

    # per-step window fields on the UNIFIED grouping (each part's plan used
    # its own group/Tp, so its per-plan windows do not transfer): window
    # base = min real brow in the step; non-real slots re-based onto it so
    # their harmless loads stay inside the window; win_rows is the max
    # span over ALL parts (one kernel shape inside shard_map)
    win_base = None
    win_rows = 0
    if windowed:
        nsteps = Tp // group
        b3 = brow.reshape(P, nsteps, group * K)
        r3 = real.reshape(P, nsteps, group * K)
        BIG = np.int64(1) << 40
        bmin = np.where(r3, b3, BIG).min(axis=2)
        bsup = np.where(r3, b3, -1).max(axis=2)
        empty = bmin >= BIG
        bmin = np.where(empty, 0, bmin)
        bsup = np.maximum(bsup, bmin)
        brow = np.where(r3, b3, bmin[:, :, None]).reshape(P, Tp, K)
        win_base = bmin.astype(np.int32)
        win_rows = int((bsup - bmin).max()) + load_need
        win_rows = -(-win_rows // 8) * 8 + 8
        xp_len = max(xp_len, (int(win_base.max()) + win_rows) * 128)

    return WJD(
        data=jnp.asarray(data),
        data_lo=None if dlo is None else jnp.asarray(dlo),
        uloc=None if uloc is None else jnp.asarray(uloc),
        brow=jnp.asarray(brow.astype(np.int32)),
        diag_u=jnp.asarray(diag),
        win_base=None if win_base is None else jnp.asarray(win_base),
        win_rows=int(win_rows),
        spill_row=jnp.asarray(sr),
        spill_col=jnp.asarray(sc),
        spill_val=jnp.asarray(sv),
        shape=(n, m),
        pad_lo=int(pad_lo),
        xp_len=int(xp_len),
        nnz=int(sum(w["nnz"] for w in ws)),
        group=int(group),
        wlog=int(wl),
        value_dtype=ws[0]["value_dtype"],
        kernel_mode=kmode or "gather",
    )


def shard_of(W: WJD, q: int = 0) -> WJD:
    """Per-shard view of a stacked WJD: strip the leading (P,) axis (use
    inside shard_map where each array arrives as its local (1, ...) block)."""
    import dataclasses as _dc

    return _dc.replace(
        W,
        data=W.data[q],
        uloc=None if W.uloc is None else W.uloc[q],
        brow=W.brow[q], diag_u=W.diag_u[q],
        spill_row=W.spill_row[q], spill_col=W.spill_col[q],
        spill_val=W.spill_val[q],
        data_lo=None if W.data_lo is None else W.data_lo[q],
        win_base=None if W.win_base is None else W.win_base[q],
    )
