"""WJD format + Pallas SpMV kernel tests (interpret mode on CPU).

The WJD format is the TPU device-kernel layer — the analog of the
reference's rocSPARSE csrmv + hip_kernels_csr.hpp (hip_matrix_csr.cpp:
1215-1276). These tests check conversion round-trips and SpMV
correctness against the XLA CSR path on structured, unstructured,
rectangular, and spill-heavy matrices.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import rocalution_tpu as rt
from rocalution_tpu.formats.wjd import csr_to_wjd, from_csr
from rocalution_tpu.ops.pallas.spmv_wjd import wjd_spmv
from rocalution_tpu.ops.spmv import attach_wjd, spmv


def _rand_csr(rng, n, m, density=0.005, dtype=np.float32):
    A = sp.random(n, m, density=density, format="csr", random_state=rng)
    A.data = rng.standard_normal(A.nnz).astype(dtype)
    return rt.CSR.from_arrays(A.data.astype(dtype),
                              A.indices.astype(np.int32),
                              A.indptr.astype(np.int32), (n, m))


def _check_spmv(A_csr, rng, **kw):
    n, m = A_csr.shape
    W = from_csr(A_csr, **kw)
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    ref = np.asarray(spmv(A_csr, x))
    got = np.asarray(wjd_spmv(W, x, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    return W


def test_wjd_laplacian_2d(rng):
    A = rt.laplacian_2d(20, dtype=np.float32)
    W = _check_spmv(A, rng)
    # hybrid split: every entry is accounted for between the DIA side and
    # the residual slot plan
    ndia = (0 if W.dia_data is None
            else int(np.count_nonzero(np.asarray(W.dia_data))))
    assert W.nnz + ndia == A.nnz


def test_wjd_random_unstructured(rng):
    A = _rand_csr(rng, 700, 700, density=0.01)
    _check_spmv(A, rng)


def test_wjd_rectangular(rng):
    A = _rand_csr(rng, 300, 900, density=0.01)
    _check_spmv(A, rng)
    A = _rand_csr(rng, 900, 300, density=0.01)
    _check_spmv(A, rng)


def test_wjd_spill_path(rng):
    # tiny slot cap forces most entries into the COO spill tail
    A = _rand_csr(rng, 500, 500, density=0.02)
    W = _check_spmv(A, rng, max_slots=2)
    assert W.spill_row.shape[0] > 0


def test_wjd_fixed_wlog(rng):
    A = _rand_csr(rng, 400, 400, density=0.01)
    for wlog in (8, 10):
        _check_spmv(A, rng, wlog=wlog)


def test_wjd_roundtrip_to_csr(rng):
    A = _rand_csr(rng, 600, 600, density=0.008)
    W = rt.convert(A, "WJD")
    back = rt.convert(W, "CSR")
    d0, i0, p0 = A.numpy_triplet()
    d1, i1, p1 = back.numpy_triplet()
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_wjd_spmv_dispatch(rng):
    # convert() path: spmv dispatches on the WJD pytree directly
    A = rt.laplacian_2d(16, dtype=np.float32)
    W = rt.convert(A, "WJD")
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    ref = np.asarray(spmv(A, x))
    np.testing.assert_allclose(np.asarray(spmv(W, x)), ref,
                               rtol=2e-5, atol=1e-5)


def test_attach_wjd_fast_path(rng):
    A = rt.laplacian_2d(16, dtype=np.float32)
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    ref = np.asarray(spmv(A, x))
    attach_wjd(A)
    assert getattr(A, "_wjd_cache", None) is not None
    np.testing.assert_allclose(np.asarray(spmv(A, x)), ref,
                               rtol=2e-5, atol=1e-5)


def test_wjd_empty():
    A = rt.CSR.from_arrays(np.zeros(0, np.float32), np.zeros(0, np.int32),
                           np.zeros(11, np.int32), (10, 10))
    W = from_csr(A)
    y = wjd_spmv(W, jnp.ones(10, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_wjd_spmm_multi_rhs(rng):
    """Blocked right-hand sides ride the batched-gather kernel (csrmm
    analog) and match per-column results."""
    A = _rand_csr(rng, 600, 500, density=0.01)
    W = from_csr(A)
    X = jnp.asarray(rng.standard_normal((500, 5)).astype(np.float32))
    ref = np.stack([np.asarray(spmv(A, X[:, j])) for j in range(5)], axis=1)
    got = np.asarray(spmv(W, X))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)
    # and through the CSR attach path
    attach_wjd(A)
    got2 = np.asarray(spmv(A, X))
    np.testing.assert_allclose(got2, ref, rtol=2e-5, atol=1e-5)


def test_wjd_spmm_chunking(rng):
    """Column counts beyond one VMEM chunk split and concatenate."""
    from rocalution_tpu.ops.pallas import spmv_wjd as mod

    A = _rand_csr(rng, 300, 300, density=0.02)
    W = from_csr(A)
    X = jnp.asarray(rng.standard_normal((300, 7)).astype(np.float32))
    ref = np.asarray(spmv(W, X))
    old = mod._MRHS_MAX_COLS
    try:
        mod._MRHS_MAX_COLS = 3   # force 3 chunks
        got = np.asarray(spmv(W, X))
    finally:
        mod._MRHS_MAX_COLS = old
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)


def test_auto_attach_in_solver(rng):
    """as_operator auto-attaches WJD to CSR when config.auto_wjd is on
    (default: TPU backend only — forced on here)."""
    from rocalution_tpu.config import set_auto_wjd

    A = rt.laplacian_2d(12, dtype=np.float32)
    b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    assert getattr(A, "_wjd_cache", None) is None
    set_auto_wjd(True)
    try:
        x, info = rt.cg(A, b, rel_tol=1e-5, max_iter=300)
    finally:
        set_auto_wjd(None)
    assert getattr(A, "_wjd_cache", None) is not None
    r = b - spmv(A, x)
    assert float(jnp.linalg.norm(r)) <= 2e-5 * float(jnp.linalg.norm(b))
    # default on CPU: no auto attach
    A2 = rt.laplacian_2d(12, dtype=np.float32)
    rt.cg(A2, b, rel_tol=1e-5, max_iter=300)
    assert getattr(A2, "_wjd_cache", None) is None


def test_auto_route_collapsed_formats(rng):
    """ELL/HYB/BCSR solver operands route through WJD with a notice when
    auto_wjd is on (their XLA applies are gather-bound on TPU; reference
    ships per-format device kernels instead)."""
    from rocalution_tpu.config import set_auto_wjd

    A = rt.laplacian_2d(12, dtype=np.float32)
    b = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    set_auto_wjd(True)
    try:
        for fmt in ("ELL", "HYB", "BCSR"):
            B = rt.convert(A, fmt)
            xs, info = rt.cg(B, b, rel_tol=1e-5, max_iter=300)
            assert getattr(B, "_wjd_cache", None) is not None, fmt
            r = b - spmv(A, xs)
            assert float(jnp.linalg.norm(r)) <= 2e-5 * float(
                jnp.linalg.norm(b)), fmt
    finally:
        set_auto_wjd(None)


def test_wjd_f64_float_float(rng):
    """f64 CSR builds the float-float WJD variant (hi+lo split exact);
    SpMV accuracy is f64-class, far beyond f32 (reference csrmv is natively
    double, hip_matrix_csr.cpp:1215-1276)."""
    A = _rand_csr(rng, 800, 800, density=0.01, dtype=np.float64)
    d, i, p = A.numpy_triplet()
    # wild dynamic range to stress the compensation
    d2 = d * np.exp(rng.standard_normal(len(d)) * 4)
    A = rt.CSR.from_arrays(d2, i, p, A.shape)
    W = from_csr(A)
    assert W.data_lo is not None
    assert W.dtype == np.float64
    # hi + lo reconstructs the f64 values exactly
    S = sp.csr_matrix((d2, i, p), shape=A.shape)
    x = rng.standard_normal(A.shape[0])
    ref = S @ x
    got = np.asarray(wjd_spmv(W, jnp.asarray(x), interpret=True))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-13, rel
    # f32 computation would be ~1e-7 — assert we beat it by orders
    got32 = np.asarray(
        S.astype(np.float32) @ x.astype(np.float32)).astype(np.float64)
    assert rel < 1e-4 * (np.linalg.norm(got32 - ref) / np.linalg.norm(ref)
                         + 1e-30)


def test_wjd_f64_attach_and_roundtrip(rng):
    A = rt.laplacian_2d(20, dtype=np.float64)
    x = rng.standard_normal(A.shape[0])
    ref = np.asarray(spmv(A, jnp.asarray(x)))
    attach_wjd(A)
    got = np.asarray(spmv(A, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-13)
    assert got.dtype == np.float64
    # WJD(f64) -> CSR reconstructs exact f64 values
    W = rt.convert(A, "WJD")
    back = rt.convert(W, "CSR")
    d0, i0, p0 = A.numpy_triplet()
    d1, i1, p1 = back.numpy_triplet()
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(d0, d1)   # bit-exact round-trip


def test_wjd_cg_end_to_end(rng):
    """CG driven entirely through the WJD kernel converges like CSR."""
    A = rt.laplacian_2d(24, dtype=np.float32)
    n = A.shape[0]
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    _, info_ref = rt.cg(A, b, rel_tol=1e-5, max_iter=400)
    W = rt.convert(A, "WJD")
    xs, info = rt.cg(W, b, rel_tol=1e-5, max_iter=400)
    assert int(info.iterations) == int(info_ref.iterations)
    r = b - spmv(A, xs)
    assert float(jnp.linalg.norm(r)) <= 1.2e-5 * float(jnp.linalg.norm(b))


def test_wjd_complex(rng):
    """Complex matrices ride two real WJD planes (the c/z csrmv analog):
    complex64 on the f32 kernel, complex128 on the float-float kernel."""
    from rocalution_tpu.formats.wjd import ComplexWJD

    for cdt, tol in ((np.complex64, 2e-5), (np.complex128, 1e-13)):
        A = _rand_csr(rng, 400, 400, density=0.01, dtype=np.float64)
        d, i, p = A.numpy_triplet()
        dc = (d + 1j * rng.standard_normal(len(d))).astype(cdt)
        Ac = rt.CSR.from_arrays(dc, i, p, A.shape)
        W = rt.convert(Ac, "WJD")
        assert isinstance(W, ComplexWJD)
        x = (rng.standard_normal(400) + 1j * rng.standard_normal(400)
             ).astype(cdt)
        S = sp.csr_matrix((dc, i, p), shape=A.shape)
        ref = S @ x
        got = np.asarray(spmv(W, jnp.asarray(x)))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < tol, (cdt, rel)
        # attach path + round-trip back to CSR
        attach_wjd(Ac)
        got2 = np.asarray(spmv(Ac, jnp.asarray(x)))
        assert np.linalg.norm(got2 - ref) / np.linalg.norm(ref) < tol
        back = rt.convert(W, "CSR")
        d2, i2, p2 = back.numpy_triplet()
        S2 = sp.csr_matrix((d2, i2, p2), shape=A.shape)
        # float-float stores 2x24-bit mantissas: values round-trip to
        # ~2^-48 relative (exact only when f32-representable)
        assert abs(S2 - S).max() < (1e-6 if cdt == np.complex64 else 1e-13)


def test_wjd_roll_mode(rng):
    """Roll-mode kernel (single dynamic lane-rotate per slot, no uloc
    stream): auto-selected for banded matrices, exact vs the XLA path;
    forced-roll on an unstructured matrix spills off-mode entries but
    stays correct."""
    # stencil matrix: auto should pick roll (split_dia off — with the
    # hybrid split a pure stencil has no residual slots to roll at all)
    A = rt.laplacian_2d(40, dtype=np.float32)
    W = from_csr(A, split_dia=False)
    assert W.kernel_mode == "roll", W.kernel_mode
    x = jnp.asarray(rng.standard_normal(A.shape[0]).astype(np.float32))
    ref = np.asarray(spmv(A, x))
    got = np.asarray(wjd_spmv(W, x, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    # 3D stencil (three windows) too
    A3 = rt.laplacian_3d(12, dtype=np.float32)
    W3 = from_csr(A3, split_dia=False)
    assert W3.kernel_mode == "roll"
    x3 = jnp.asarray(rng.standard_normal(A3.shape[0]).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(wjd_spmv(W3, x3, interpret=True)),
        np.asarray(spmv(A3, x3)), rtol=2e-5, atol=1e-5)

    # unstructured: auto stays gather; forcing roll spills but is correct
    Ar = _rand_csr(rng, 500, 500, density=0.01)
    Wg = from_csr(Ar)
    assert Wg.kernel_mode == "gather"
    Wr = from_csr(Ar, kernel_mode="roll")
    assert Wr.kernel_mode == "roll"
    assert Wr.spill_row.shape[0] > 0
    xr = jnp.asarray(rng.standard_normal(500).astype(np.float32))
    refr = np.asarray(spmv(Ar, xr))
    np.testing.assert_allclose(np.asarray(wjd_spmv(Wr, xr, interpret=True)),
                               refr, rtol=2e-5, atol=1e-5)
    # roundtrip through CSR preserves the matrix (incl. spilled entries)
    back = rt.convert(Wr, "CSR")
    d0, i0, p0 = Ar.numpy_triplet()
    d1, i1, p1 = back.numpy_triplet()
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_wjd_roll_mode_f64(rng):
    """Roll-mode float-float kernel keeps f64-class accuracy."""
    A = rt.laplacian_2d(30, dtype=np.float64)
    d, i, p = A.numpy_triplet()
    d = d * (1 + 1e-9 * rng.standard_normal(len(d)))  # not f32-exact
    A = rt.CSR.from_arrays(d, i, p, A.shape)
    W = from_csr(A)
    assert W.kernel_mode == "roll" and W.data_lo is not None
    x = rng.standard_normal(A.shape[0])
    S = sp.csr_matrix((d, i, p), shape=A.shape)
    ref = S @ x
    got = np.asarray(wjd_spmv(W, jnp.asarray(x), interpret=True))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-13


def test_wjd_bf16_values():
    """bf16-values WJD: half the matrix bytes, f32 accumulation (~1e-3
    relative). No reference counterpart (rocSPARSE csrmv is f32/f64); the
    TPU-native extension for accuracy-tolerant applies (inner MPDC
    operator, smoothers)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from rocalution_tpu.formats.wjd import from_csr
    from rocalution_tpu.ops.spmv import spmv

    rng = np.random.default_rng(3)
    A = rt.random_banded_spd(4000, bandwidth=300)
    d, i, p = A.numpy_triplet()
    S = sp.csr_matrix((d.astype(np.float64), i, p), shape=A.shape)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    for mode in ("roll", "gather"):
        W = from_csr(A, values_dtype="bfloat16", kernel_mode=mode)
        assert W.data.dtype == jnp.bfloat16
        y = np.asarray(spmv(W, jnp.asarray(x)))
        assert y.dtype == np.float32
        ref = S @ x.astype(np.float64)
        rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
        assert rel < 2e-2, (mode, rel)
    # multi-RHS rides the batched kernel with f32 accumulators
    X = rng.standard_normal((A.shape[0], 3)).astype(np.float32)
    W = from_csr(A, values_dtype="bfloat16", kernel_mode="gather")
    Y = np.asarray(spmv(W, jnp.asarray(X)))
    rel = np.linalg.norm(Y - S @ X.astype(np.float64)) / np.linalg.norm(S @ X)
    assert rel < 2e-2, rel


def test_wjd_plan_disk_cache(tmp_path, monkeypatch):
    """On-disk plan cache (wjd_cache.py): a cached plan must reconstruct a
    WJD identical to a fresh analysis — arrays, statics, and SpMV result —
    across f32, float-float f64, and bf16 variants (the analog of paying
    the reference's csrmv-analysis once; key = content hash)."""
    import dataclasses

    from rocalution_tpu.formats import wjd_cache
    from rocalution_tpu.formats.wjd import csr_to_wjd_plan

    monkeypatch.setenv("ROCALUTION_TPU_PLAN_CACHE", str(tmp_path))
    rng = np.random.default_rng(0)
    A = rt.random_banded_spd(2000, bandwidth=100, dtype=np.float64)
    d, i, p = A.numpy_triplet()
    # force caching below the size floor by hashing directly
    for kwargs in ({}, {"values_dtype": "bfloat16"},
                   {"kernel_mode": "gather"}):
        key = wjd_cache.plan_key(d, i, p, A.shape, kwargs)
        fresh = csr_to_wjd_plan(d, i, p, A.shape, cache=False, **kwargs)
        wjd_cache.save_plan(key, fresh)
        loaded = wjd_cache.load_plan(key)
        assert loaded is not None
        for f in ("data", "data_lo", "uloc", "brow", "diag_u",
                  "spill_row", "spill_col", "spill_val"):
            a, b = fresh[f], loaded[f]
            if a is None:
                assert b is None
                continue
            assert a.dtype == b.dtype, f
            np.testing.assert_array_equal(np.asarray(a, np.float32)
                                          if str(a.dtype) == "bfloat16"
                                          else a,
                                          np.asarray(b, np.float32)
                                          if str(b.dtype) == "bfloat16"
                                          else b, err_msg=f)
        for f in ("shape", "pad_lo", "xp_len", "nnz", "group", "wlog",
                  "value_dtype", "kernel_mode"):
            assert fresh[f] == loaded[f], f
    # version bump or corrupt file -> miss, not crash
    key = wjd_cache.plan_key(d, i, p, A.shape, {})
    path = tmp_path / (key + ".npz")
    path.write_bytes(b"not an npz")
    assert wjd_cache.load_plan(key) is None


def test_wjd_plan_cache_hit_in_conversion(tmp_path, monkeypatch):
    """csr_to_wjd with cache=True round-trips through the disk cache at
    >=100k nnz and produces a working SpMV."""
    import scipy.sparse as sp

    monkeypatch.setenv("ROCALUTION_TPU_PLAN_CACHE", str(tmp_path))
    rng = np.random.default_rng(1)
    A = rt.random_banded_spd(30000, bandwidth=300)   # > 100k nnz
    d, i, p = A.numpy_triplet()
    W1 = csr_to_wjd(d, i, p, A.shape)
    files = list(tmp_path.glob("*.npz"))
    assert len(files) == 1                 # plan persisted
    W2 = csr_to_wjd(d, i, p, A.shape)      # cache hit path
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    y1 = np.asarray(spmv(W1, jnp.asarray(x)))
    y2 = np.asarray(spmv(W2, jnp.asarray(x)))
    np.testing.assert_array_equal(y1, y2)
    S = sp.csr_matrix((d, i, p), shape=A.shape)
    rel = np.linalg.norm(y1 - S @ x) / np.linalg.norm(S @ x)
    assert rel < 1e-5


def test_wjd_roll_window_plan_fields():
    """Per-step window metadata for the HBM-x roll variant: win_base must
    bound every slot's loads ([brow, brow+17] within [wb, wb+win_rows)),
    empty slots included (they are re-based into the step window)."""
    A = rt.laplacian_3d(24, dtype=np.float32)   # banded -> roll mode
    d, i, p = A.numpy_triplet()
    from rocalution_tpu.formats.wjd import csr_to_wjd_plan

    # split_dia=False: this test inspects the ROLL slot plan internals
    # (with the hybrid split a pure stencil has no residual slots at all)
    plan = csr_to_wjd_plan(d, i, p, A.shape, cache=False, split_dia=False)
    assert plan["kernel_mode"] == "roll"
    wb = plan["win_base"]
    WR = plan["win_rows"]
    assert wb is not None and WR > 0 and WR % 8 == 0
    Tp, K = plan["brow"].shape
    group = plan["group"]
    nsteps = Tp // group
    assert wb.shape == (nsteps,)
    b3 = plan["brow"].reshape(nsteps, group, K)
    q3 = (plan["diag_u"].reshape(nsteps, group, K) >> 7)
    lo = b3.min(axis=(1, 2))
    hi = (b3 + q3).max(axis=(1, 2)) + 17
    assert (lo >= wb).all()
    assert (hi <= wb + WR).all()
    # padded x covers the deepest window
    assert int(wb.max()) + WR <= plan["xp_len"] // 128
    # the interpret-mode apply (whole-x path) still matches scipy
    import scipy.sparse as sp

    W = csr_to_wjd(d, i, p, A.shape, cache=False, split_dia=False)
    x = np.random.default_rng(0).standard_normal(A.shape[0]).astype(
        np.float32)
    y = np.asarray(spmv(W, jnp.asarray(x)))
    ref = sp.csr_matrix((d, i, p), shape=A.shape) @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-5


def test_stack_wjd_window_fields(monkeypatch):
    """Stacked (distributed interior) WJD must carry per-part window
    metadata so beyond-VMEM shards ride the HBM-x kernels inside
    shard_map (round-4 weakness: stack_wjd never set win_base and big
    shards fell back to the XLA path; reference: every rank runs the
    same optimized csrmv regardless of size, global_matrix.cpp:976-1007)."""
    import scipy.sparse as sp

    import rocalution_tpu.formats.wjd as wjd_mod
    from rocalution_tpu.formats.wjd import shard_of, stack_wjd

    A = rt.laplacian_2d(48, dtype=np.float32)
    d, i, p = A.numpy_triplet()
    n = A.shape[0]
    nl = n // 2
    # two per-part triplets (rows local, cols global)
    parts = []
    for q in range(2):
        lo, hi = q * nl, (q + 1) * nl
        pp = p[lo:hi + 1] - p[lo]
        parts.append((d[p[lo]:p[hi]], i[p[lo]:p[hi]], pp))
    # force the windowed regime on this tiny operator
    monkeypatch.setattr(wjd_mod, "X_VMEM_BUDGET", 1024)
    W = stack_wjd(parts, (nl, n))
    assert W.win_base is not None and W.win_rows > 0
    P, Tp = W.data.shape[0], W.brow.shape[1]
    nsteps = Tp // W.group
    assert W.win_base.shape == (P, nsteps)
    # every slot's deepest load stays inside its step window
    load = 17 if W.kernel_mode == "roll" else 8 + (1 << W.wlog) // 128
    for q in range(2):
        b3 = np.asarray(W.brow[q]).reshape(nsteps, W.group, -1)
        wb = np.asarray(W.win_base[q])
        assert (b3.min(axis=(1, 2)) >= wb).all()
        assert (b3.max(axis=(1, 2)) + load <= wb + W.win_rows).all()
    assert int(np.asarray(W.win_base).max()) + W.win_rows <= W.xp_len // 128
    # per-shard interpret apply still matches scipy on each part
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    S = sp.csr_matrix((d, i, p), shape=A.shape)
    ref = S @ x
    from rocalution_tpu.ops.pallas.spmv_wjd import wjd_spmv

    for q in range(2):
        y = np.asarray(wjd_spmv(shard_of(W, q), jnp.asarray(x),
                                interpret=True))
        rel = np.linalg.norm(y - ref[q * nl:(q + 1) * nl]) / \
            np.linalg.norm(ref)
        assert rel < 1e-5, (q, rel)



def test_wjd_hybrid_dia_split(rng):
    """Hybrid DIA split (round-4 VERDICT item 10): globally dense
    diagonals leave the slot plan and ride the fused XLA static-shift
    path; partially dense diagonals stay in the kernel; parity is exact
    on the union."""
    from rocalution_tpu.formats.wjd import csr_to_wjd

    # stencil: everything splits, kernel has nothing to do
    A = rt.laplacian_2d(24, dtype=np.float32)
    d, i, p = A.numpy_triplet()
    W = csr_to_wjd(d, i, p, A.shape, cache=False)
    assert W.dia_data is not None and len(W.dia_offsets) == 5
    assert W.nnz == 0 and W.spill_row.shape[0] == 0
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    ref = sp.csr_matrix((d, i, p), shape=A.shape) @ x
    got = np.asarray(wjd_spmv(W, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    # mixed: dense main diagonal + scattered band -> partial split
    Ar = rt.random_banded_spd(4096, bandwidth=512, dtype=np.float32)
    d, i, p = Ar.numpy_triplet()
    W = csr_to_wjd(d, i, p, Ar.shape, cache=False)
    assert W.dia_data is not None and W.nnz > 0
    x = rng.standard_normal(Ar.shape[0]).astype(np.float32)
    ref = sp.csr_matrix((d, i, p), shape=Ar.shape) @ x
    got = np.asarray(wjd_spmv(W, jnp.asarray(x), interpret=True))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5

    # f64 keeps the exact float-float path (no split)
    A8 = rt.laplacian_2d(16, dtype=np.float64)
    d, i, p = A8.numpy_triplet()
    W8 = csr_to_wjd(d, i, p, A8.shape, cache=False)
    assert W8.dia_data is None and W8.data_lo is not None
