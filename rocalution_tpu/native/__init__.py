"""Native (C++) setup-phase kernels.

Reference parity: rocALUTION's host backend is C++ (src/base/host/*); the
sequential factorization sweeps and file parsing live there. Here the same
split holds: JAX/XLA/Pallas own the device compute path, and this module is
the native runtime layer for the sequential host work — compiled once from
csrc/rocalution_tpu_native.cpp with g++ and bound via ctypes (no pybind11
in this environment).

Every entry point has a pure-numpy fallback in ops/factorize — `available()`
gates dispatch, mirroring the reference's capability-flag design
(base_matrix.hpp bool returns → host fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "rocalution_tpu_native.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "ROCALUTION_TPU_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rocalution_tpu"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"native_{tag}.so")
    if not os.path.exists(lib_path):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", lib_path + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(lib_path + ".tmp", lib_path)
        except Exception as e:  # compiler missing / failed: fall back
            print(f"rocalution_tpu: native build failed ({e}); "
                  "using numpy fallbacks", file=sys.stderr)
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.rt_ilu0_csr.restype = ctypes.c_int64
    lib.rt_ilu0_csr.argtypes = [ctypes.c_int64, i64p, i32p, f64p]
    lib.rt_ic0_csr.restype = ctypes.c_int64
    lib.rt_ic0_csr.argtypes = [ctypes.c_int64, i64p, i32p, f64p]
    lib.rt_ilut_csr.restype = ctypes.c_int64
    lib.rt_ilut_csr.argtypes = [
        ctypes.c_int64, i64p, i32p, f64p, ctypes.c_double, ctypes.c_int64,
        i32p, f64p, i64p, i32p, f64p, i64p,
    ]
    lib.rt_mtx_body.restype = ctypes.c_int
    lib.rt_mtx_body.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        i64p, i64p, f64p, f64p,
    ]
    lib.rt_greedy_aggregate.restype = ctypes.c_int64
    lib.rt_greedy_aggregate.argtypes = [ctypes.c_int64, i64p, i32p, i64p]
    lib.rt_pairwise_match.restype = ctypes.c_int64
    lib.rt_pairwise_match.argtypes = [
        ctypes.c_int64, i64p, i32p, f64p, ctypes.c_double, i64p, i64p,
    ]
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.rt_rs_coarsening.restype = ctypes.c_int64
    lib.rt_rs_coarsening.argtypes = [
        ctypes.c_int64, i64p, i32p, i64p, i32p, ctypes.c_int, i8p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("ROCALUTION_TPU_NO_NATIVE") != "1":
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return get_lib() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def ilu0_inplace(indptr: np.ndarray, cols: np.ndarray,
                 data: np.ndarray) -> None:
    """In-place IKJ ILU(0); raises on zero pivot."""
    lib = get_lib()
    n = len(indptr) - 1
    rc = lib.rt_ilu0_csr(
        n, _ptr(indptr, ctypes.c_int64), _ptr(cols, ctypes.c_int32),
        _ptr(data, ctypes.c_double),
    )
    if rc != 0:
        raise ZeroDivisionError(f"ILU(0) breakdown at row {-rc - 1}")


def ic0_inplace(indptr: np.ndarray, cols: np.ndarray,
                data: np.ndarray) -> None:
    lib = get_lib()
    n = len(indptr) - 1
    rc = lib.rt_ic0_csr(
        n, _ptr(indptr, ctypes.c_int64), _ptr(cols, ctypes.c_int32),
        _ptr(data, ctypes.c_double),
    )
    if rc != 0:
        raise ValueError(f"IC(0) breakdown at row {-rc - 1}")


def ilut(indptr: np.ndarray, cols: np.ndarray, data: np.ndarray,
         tol: float, max_fill: int) -> Tuple:
    """ILUT(t, m); returns (l_rows, l_cols, l_vals, u_rows, u_cols, u_vals)
    in COO form (L strict lower — unit diagonal NOT included)."""
    lib = get_lib()
    n = len(indptr) - 1
    l_cols = np.zeros(n * max_fill, np.int32)
    l_vals = np.zeros(n * max_fill, np.float64)
    l_cnt = np.zeros(n, np.int64)
    u_cols = np.zeros(n * (max_fill + 1), np.int32)
    u_vals = np.zeros(n * (max_fill + 1), np.float64)
    u_cnt = np.zeros(n, np.int64)
    rc = lib.rt_ilut_csr(
        n, _ptr(indptr, ctypes.c_int64), _ptr(cols, ctypes.c_int32),
        _ptr(data, ctypes.c_double), float(tol), int(max_fill),
        _ptr(l_cols, ctypes.c_int32), _ptr(l_vals, ctypes.c_double),
        _ptr(l_cnt, ctypes.c_int64),
        _ptr(u_cols, ctypes.c_int32), _ptr(u_vals, ctypes.c_double),
        _ptr(u_cnt, ctypes.c_int64),
    )
    if rc != 0:
        raise ZeroDivisionError(f"ILUT breakdown at row {-rc - 1}")

    def unpack(ccols, cvals, cnt, stride):
        rows = np.repeat(np.arange(n), cnt)
        mask = (np.arange(stride)[None, :] < cnt[:, None]).ravel()
        return rows, ccols.reshape(n, stride).ravel()[mask], \
            cvals.reshape(n, stride).ravel()[mask]

    lr, lc, lv = unpack(l_cols, l_vals, l_cnt, max_fill)
    ur, uc, uv = unpack(u_cols, u_vals, u_cnt, max_fill + 1)
    return lr, lc, lv, ur, uc, uv


def greedy_aggregate(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Vanek greedy aggregation over a strength graph (native sweep —
    reference AMGGreedyAggregate). Returns agg ids in [0, n_agg)."""
    lib = get_lib()
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    agg = np.full(n, -1, np.int64)
    lib.rt_greedy_aggregate(
        n, _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(agg, ctypes.c_int64),
    )
    return agg


def pairwise_match(indptr: np.ndarray, indices: np.ndarray,
                   data: np.ndarray, beta: float,
                   order: np.ndarray) -> Tuple[np.ndarray, int]:
    """One Notay pairwise matching pass (native sweep). Returns
    (new_id, n_pairs)."""
    lib = get_lib()
    m = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float64)
    order = np.ascontiguousarray(order, np.int64)
    new_id = np.full(m, -1, np.int64)
    na = lib.rt_pairwise_match(
        m, _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(data, ctypes.c_double), float(beta),
        _ptr(order, ctypes.c_int64), _ptr(new_id, ctypes.c_int64),
    )
    return new_id, int(na)


def rs_coarsening(s_indptr, s_indices, st_indptr, st_indices,
                  cf_init: np.ndarray, second_pass: bool = True) -> np.ndarray:
    """Classical greedy Ruge-Stueben C/F splitting (native sweep).
    cf_init: int8, 0 undecided / 2 pre-forced F. Returns cf (1=C, 2=F)."""
    lib = get_lib()
    n = len(s_indptr) - 1
    s_indptr = np.ascontiguousarray(s_indptr, np.int64)
    s_indices = np.ascontiguousarray(s_indices, np.int32)
    st_indptr = np.ascontiguousarray(st_indptr, np.int64)
    st_indices = np.ascontiguousarray(st_indices, np.int32)
    cf = np.ascontiguousarray(cf_init, np.int8).copy()
    lib.rt_rs_coarsening(
        n, _ptr(s_indptr, ctypes.c_int64), _ptr(s_indices, ctypes.c_int32),
        _ptr(st_indptr, ctypes.c_int64), _ptr(st_indices, ctypes.c_int32),
        int(second_pass), _ptr(cf, ctypes.c_int8),
    )
    return cf


def mtx_body(path: str, header_offset: int, nnz: int,
             ncols_per_line: int) -> Tuple:
    lib = get_lib()
    rows = np.zeros(nnz, np.int64)
    cols = np.zeros(nnz, np.int64)
    re = np.zeros(nnz, np.float64)
    im = np.zeros(nnz, np.float64) if ncols_per_line == 4 else None
    rc = lib.rt_mtx_body(
        path.encode(), int(header_offset), int(nnz), int(ncols_per_line),
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64),
        _ptr(re, ctypes.c_double),
        _ptr(im, ctypes.c_double) if im is not None
        else ctypes.cast(None, ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(f"mtx body parse failed ({rc}) for {path}")
    return rows, cols, re, im
