"""Sparse matrix–vector (and multi-vector) products for every format.

Reference parity: per-format Apply/ApplyAdd (HostMatrix*::Apply,
HIPAcceleratorMatrix*::Apply via rocSPARSE csrmv/coomv/ellmv/...,
e.g. hip_matrix_csr.cpp:1215-1276). TPU-native formulation:

* CSR/COO  → vectorized multiply + `segment_sum` (no per-row loops),
* ELL      → one gather + dense (nrow, width) multiply + row-reduce,
* DIA      → gather-free static shifted multiplies (fastest for stencils),
* BCSR     → one batched `dot_general` over dense blocks (MXU path),
* MCSR     → diagonal multiply + CSR off-diagonal,
* DENSE    → plain matmul.

`x` may be (n,) or (n, k) — every path supports blocked right-hand sides
(SpMM) for free, which is how multiple-RHS solves and AMG interpolation ride
the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..formats import BCSR, COO, CSR, DENSE, DIA, ELL, HYB, MCSR, WJD
from ..formats.stencil import Stencil
from ..formats.wjd import ComplexWJD


@functools.singledispatch
def spmv(A, x):
    """y = A @ x (reference: Operator::Apply, src/base/operator.hpp)."""
    if callable(A):  # matrix-free operator
        return A(x)
    raise TypeError(f"spmv: unsupported operator type {type(A).__name__}")


def spmv_add(A, x, y, alpha=1.0):
    """y + alpha * A @ x (reference: Operator::ApplyAdd)."""
    return y + alpha * spmv(A, x)


def _expand(vals, x_gathered):
    """Broadcast 1-D nonzero values over trailing RHS dims."""
    if x_gathered.ndim == vals.ndim:
        return vals * x_gathered
    return vals[(...,) + (None,) * (x_gathered.ndim - vals.ndim)] * x_gathered


@spmv.register(WJD)
def _spmv_wjd(A: WJD, x):
    from .pallas.spmv_wjd import wjd_spmm, wjd_spmv

    if x.ndim != 1:
        return wjd_spmm(A, x)
    return wjd_spmv(A, x)


@spmv.register(ComplexWJD)
def _spmv_cwjd(A: ComplexWJD, x):
    """Complex apply = 4 real plane applies (the c/z csrmv analog):
    y = (Ar x_r - Ai x_i) + i (Ar x_i + Ai x_r). Host complex input is
    split into planes BEFORE upload: some TPU transports (the axon relay)
    cannot transfer complex buffers, while on-device complex built from
    real planes works everywhere."""
    import numpy as np

    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        xr = jnp.asarray(np.ascontiguousarray(x.real))
        xi = jnp.asarray(np.ascontiguousarray(x.imag))
        yr = _spmv_wjd(A.re, xr) - _spmv_wjd(A.im, xi)
        yi = _spmv_wjd(A.re, xi) + _spmv_wjd(A.im, xr)
        return jax.lax.complex(yr, yi)
    xr = jnp.real(x)
    xi = jnp.imag(x) if jnp.iscomplexobj(x) else jnp.zeros_like(xr)
    yr = _spmv_wjd(A.re, xr) - _spmv_wjd(A.im, xi)
    yi = _spmv_wjd(A.re, xi) + _spmv_wjd(A.im, xr)
    return jax.lax.complex(yr, yi)


@spmv.register(CSR)
def _spmv_csr(A: CSR, x):
    wjd = getattr(A, "_wjd_cache", None)
    if wjd is not None and _use_pallas(wjd, x.dtype):
        return spmv(wjd, x)
    prod = _expand(A.data, x[A.indices])
    return jax.ops.segment_sum(
        prod, A.row_ids, num_segments=A.shape[0], indices_are_sorted=True
    )


def _use_pallas(wjd, xdt) -> bool:
    """Can this WJD cache serve a rhs of dtype `xdt`? f32/bf16 ride the
    native kernel; f64 rides the float-float kernel iff the cache was
    built from f64 values (data_lo present); complex rides the matching
    two-plane ComplexWJD."""
    xdt = jnp.dtype(xdt)
    if isinstance(wjd, ComplexWJD):
        ff = wjd.re.data_lo is not None
        if xdt in (jnp.dtype(jnp.complex64), jnp.dtype(jnp.float32)):
            return not ff
        if xdt in (jnp.dtype(jnp.complex128), jnp.dtype(jnp.float64)):
            return ff
        return False
    if xdt in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
        return wjd.data_lo is None
    if xdt == jnp.dtype(jnp.float64):
        return wjd.data_lo is not None
    return False


# The kernel streams brow/diag_u as per-grid-step (group, K) SMEM blocks
# (ops/pallas/spmv_wjd._specs) — a few KB per step — so matrix size no
# longer bounds SMEM. (History: whole-array scalar prefetch stored the
# operand padded to (ceil8(Tp), 128) int32, so ANY operator beyond ~1M
# rows exceeded the 1 MiB SMEM budget regardless of K — seen on hardware
# at 2.1M as 'Allocation (size=1052672) would exceed memory'.) The
# remaining gate is the per-step SMEM block itself, padded the same way.
_WJD_SMEM_BUDGET = 900_000


def _wjd_fits(W) -> bool:
    from ..formats.wjd import ComplexWJD
    from .pallas.spmv_wjd import _X_VMEM_BUDGET

    if isinstance(W, ComplexWJD):
        return _wjd_fits(W.re)
    group = int(W.group)
    pad8 = -(-group // 8) * 8
    if 2 * 4 * pad8 * 128 > _WJD_SMEM_BUDGET:
        return False
    # x-plane VMEM requirement: the kernels keep the padded x VMEM-resident
    # (scoped limit ~16 MiB) EXCEPT the roll variant with per-step windows
    # (win_base), which keeps x in HBM and needs only win_rows*512 B
    xp_bytes = int(W.xp_len) * 4
    # the windowed kernels hold TWO (win_rows, 128) f32 buffers (double
    # buffering; the ff variant holds one window per plane — same total):
    # one outlier step with scattered slots can blow win_rows past the
    # scoped budget (seen at a 119k x 2M restriction: 17k-row windows),
    # in which case the operator falls back to the XLA path
    win_bytes = 2 * int(W.win_rows) * 512
    if W.data_lo is not None:              # float-float: two planes
        # the windowed ff kernel exists for roll mode only; it double-
        # buffers BOTH the hi and lo planes (4 window buffers total)
        if W.kernel_mode == "roll" and W.win_base is not None:
            return (2 * xp_bytes <= _X_VMEM_BUDGET
                    or 2 * win_bytes <= _X_VMEM_BUDGET)
        return 2 * xp_bytes <= _X_VMEM_BUDGET
    if W.win_base is not None:             # windowed (roll AND gather)
        return (xp_bytes <= _X_VMEM_BUDGET
                or win_bytes <= _X_VMEM_BUDGET)
    return xp_bytes <= _X_VMEM_BUDGET


def attach_wjd(A: CSR, **kwargs) -> CSR:
    """Attach a WJD fast-apply representation to a host-built CSR (the analog
    of rocSPARSE csrmv analysis, hip_sparse.hpp csrmv_analysis). Subsequent
    `spmv(A, x)` calls with the SAME concrete object use the Pallas kernel;
    the attachment is invisible to pytree flattening (jit-argument copies
    fall back to the XLA path). Solvers auto-attach at build via
    `as_operator` (see `maybe_attach_wjd`), so on TPU a plain `rt.cg(A_csr,
    b)` rides the kernel with no manual step.

    Raises ValueError when the slot plan cannot fit the kernel's SMEM
    budget (use the XLA path instead); `maybe_attach_wjd` treats that as
    "not eligible" silently."""
    from ..formats.wjd import from_csr

    W = from_csr(A, **kwargs)
    if not _wjd_fits(W):
        raise ValueError(
            f"WJD slot plan ({W.brow.shape}) exceeds the kernel SMEM "
            "budget; matrix is too scattered for the fast path"
        )
    object.__setattr__(A, "_wjd_cache", W)
    return A


def _wjd_eligible(A: CSR) -> bool:
    """Host triplet available + a value dtype one of the kernels serves."""
    import numpy as np

    cache = getattr(A, "_host_cache", None)
    if not cache or "data" not in cache:
        return False
    return np.dtype(cache["data"].dtype) in (
        np.float32, np.float64, np.complex64, np.complex128)


# formats whose XLA apply collapses on TPU (gather-serialized: measured
# ~1 GB/s vs the reference's per-format device kernels) — solvers route
# them through a WJD conversion with a logged notice rather than silently
# running ~800x slow (VERDICT r2; reference ships hip_matrix_{ell,hyb,
# bcsr}.cpp device SpMV instead)
_WJD_ROUTED = (ELL, HYB, BCSR)


def _auto_wjd_on() -> bool:
    from ..config import get_config

    auto = get_config().auto_wjd
    if auto is None:
        auto = jax.default_backend() == "tpu"
    return auto


def trace_state_clean() -> bool:
    """True iff we are NOT inside a jax trace. Building a WJD cache under
    tracing would wrap its arrays in tracers and leak them into later
    traces via the attached-object side channel (UnexpectedTracerError on
    the second solver call — seen on hardware in the r3 bench, gmres+ilu).
    Setup-time attachment is the only safe kind."""
    try:
        from jax._src.core import trace_state_clean as _tsc

        return _tsc()
    except Exception:
        return True


def maybe_attach_wjd(A):
    """Auto-attach WJD to a host-built CSR (and, with a notice, to the
    gather-bound ELL/HYB/BCSR formats) when the fast path applies
    (config.auto_wjd; default = only on the TPU backend, where the XLA
    gather path is ~800x slower than the Pallas kernel). The analog of the
    reference running csrmv analysis inside Solver::Build."""
    if not isinstance(A, (CSR,) + _WJD_ROUTED):
        return A
    if getattr(A, "_wjd_cache", None) is not None or not _auto_wjd_on():
        return A
    if not trace_state_clean():
        return A          # never build device caches while tracing
    try:
        if isinstance(A, CSR):
            if _wjd_eligible(A):
                attach_wjd(A)
            return A
        # ELL/HYB/BCSR: route via CSR when host data is available
        probe = A.ell if isinstance(A, HYB) else A
        if not getattr(probe, "_host_cache", None):
            return A
        from ..formats.convert import to_csr
        from ..formats.wjd import from_csr
        from ..utils.log import log_info

        W = from_csr(to_csr(A))
        if not _wjd_fits(W):
            return A
        object.__setattr__(A, "_wjd_cache", W)
        log_info(
            f"{type(A).__name__} apply is gather-bound on TPU; routing "
            "SpMV through the WJD Pallas kernel (set_auto_wjd(False) to "
            "keep the native path)"
        )
    except Exception:  # fast path is an optimization — never fail the solve
        from ..utils.log import log_debug

        log_debug(A, "maybe_attach_wjd: conversion failed, using XLA path")
    return A


@spmv.register(COO)
def _spmv_coo(A: COO, x):
    prod = _expand(A.data, x[A.col])
    return jax.ops.segment_sum(prod, A.row, num_segments=A.shape[0])


def _routed(A, x):
    """Serve a collapsed-format apply through an attached WJD cache."""
    wjd = getattr(A, "_wjd_cache", None)
    if wjd is not None and _use_pallas(wjd, x.dtype):
        return spmv(wjd, x)
    return None


@spmv.register(ELL)
def _spmv_ell(A: ELL, x):
    y = _routed(A, x)
    if y is not None:
        return y
    safe_ind = jnp.maximum(A.indices, 0)
    xs = x[safe_ind]                     # (nrow, width[, k])
    prod = _expand(A.data, xs)
    # padded entries have data == 0, so no masking needed in the product
    return jnp.sum(prod, axis=1)


@spmv.register(DIA)
def _spmv_dia(A: DIA, x):
    # One fused elementwise pass: pad x once, then every diagonal is a
    # static slice of the pad — XLA fuses the whole sum into a single
    # VPU loop (the scatter-style `.at[lo:hi].add` formulation breaks
    # fusion and costs one memory pass per diagonal).
    n, m = A.shape
    if not A.offsets:
        return jnp.zeros((n,) + x.shape[1:], dtype=jnp.result_type(A.data, x))
    lo_pad = max(0, -min(A.offsets))
    hi_pad = max(0, max(A.offsets) + n - m)
    pad_widths = ((lo_pad, hi_pad),) + ((0, 0),) * (x.ndim - 1)
    xpad = jnp.pad(x, pad_widths)
    y = None
    for d, off in enumerate(A.offsets):
        # rows outside [max(0,-off), min(n, m-off)) must see zero: padded
        # x slots are zero, and A.data is zero-padded there by convert
        seg = _expand(A.data[d, :n], xpad[lo_pad + off: lo_pad + off + n])
        y = seg if y is None else y + seg
    return y


@spmv.register(HYB)
def _spmv_hyb(A: HYB, x):
    y = _routed(A, x)
    if y is not None:
        return y
    return _spmv_ell(A.ell, x) + _spmv_coo(A.coo, x)


@spmv.register(BCSR)
def _spmv_bcsr(A: BCSR, x):
    y = _routed(A, x)
    if y is not None:
        return y
    bd = A.block_dim
    nrowb = A.nrowb
    ncolb = -(-A.shape[1] // bd)
    vec = x.ndim == 1
    xk = x[:, None] if vec else x
    k = xk.shape[1]
    pad = ncolb * bd - xk.shape[0]
    if pad:
        xk = jnp.concatenate([xk, jnp.zeros((pad, k), xk.dtype)], axis=0)
    xb = xk.reshape(ncolb, bd, k)[A.indices]          # (nnzb, bd, k)
    prod = jnp.einsum(
        "nij,njk->nik", A.data, xb,
        preferred_element_type=jnp.result_type(A.data, x),
    )
    yb = jax.ops.segment_sum(
        prod, A.row_ids, num_segments=nrowb, indices_are_sorted=True
    )
    y = yb.reshape(nrowb * bd, k)[: A.shape[0]]
    return y[:, 0] if vec else y


@spmv.register(MCSR)
def _spmv_mcsr(A: MCSR, x):
    n = min(A.shape)
    diag_part = _expand(A.diag[:n], x[:n])
    y = _spmv_csr(A.offd, x)
    return y.at[:n].add(diag_part)


@spmv.register(Stencil)
def _spmv_stencil(A: Stencil, x):
    return A.apply(x)


@spmv.register(DENSE)
def _spmv_dense(A: DENSE, x):
    return jnp.matmul(
        A.data, x, preferred_element_type=jnp.result_type(A.data, x)
    )


def as_operator(A):
    """Normalize a matrix pytree / callable into a closure x -> A @ x.
    CSR operands get the WJD fast path attached here (setup phase)."""
    if callable(A) and not isinstance(
        A, (CSR, COO, ELL, DIA, HYB, BCSR, MCSR, DENSE)
    ):
        return A
    maybe_attach_wjd(A)
    return lambda x: spmv(A, x)
