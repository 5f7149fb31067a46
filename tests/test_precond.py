"""Preconditioner stack tests — factorization exactness oracles plus the
reference's solver×preconditioner convergence matrix (testing_cg.hpp
pattern: preconditioned solve must converge and reduce iteration count)."""

import numpy as np
import pytest
import scipy.sparse as sp

import rocalution_tpu as rt
from rocalution_tpu.formats.base import get_host
from rocalution_tpu.ops import extract, factorize, ordering, trisolve
from rocalution_tpu.precond import (gs, ic, ilu, ilut_precond, itilu0,
                                    jacobi, multicolored_gs,
                                    multicolored_ilu, multicolored_sgs, sgs,
                                    sor, ssor)


def _to_scipy(A):
    d, i, p = A.numpy_triplet()
    return sp.csr_matrix((np.asarray(d), np.asarray(i), np.asarray(p)),
                         shape=A.shape)


@pytest.fixture
def A16():
    return rt.laplacian_2d(16)


# ---------- orderings ----------

def test_multicoloring_is_valid(A16):
    ncol, perm, sizes = ordering.multicoloring(A16)
    n = A16.shape[0]
    assert sizes.sum() == n
    S = _to_scipy(A16)
    S = (S + S.T).tocsr()
    # colors from permutation + block sizes
    colors = np.empty(n, np.int64)
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    newidx = perm
    for c in range(ncol):
        sel = (newidx >= bounds[c]) & (newidx < bounds[c + 1])
        colors[sel] = c
    for i in range(n):
        nbr = S.indices[S.indptr[i]:S.indptr[i + 1]]
        nbr = nbr[nbr != i]
        assert not np.any(colors[nbr] == colors[i])


def test_mis_is_independent(A16):
    size, perm = ordering.maximal_independent_set(A16)
    order = np.argsort(perm)
    in_set = np.zeros(A16.shape[0], bool)
    in_set[order[:size]] = True
    S = _to_scipy(A16)
    for i in np.where(in_set)[0]:
        nbr = S.indices[S.indptr[i]:S.indptr[i + 1]]
        nbr = nbr[nbr != i]
        assert not in_set[nbr].any()


def test_rcmk_reduces_bandwidth():
    A = rt.utils.generators.random_spd(200, density=0.03, seed=1)
    perm = ordering.rcmk(A)
    S = _to_scipy(A)
    r, c = S.nonzero()
    bw0 = np.max(np.abs(r - c))
    bw1 = np.max(np.abs(perm[r] - perm[c]))
    assert bw1 < bw0


def test_permute_roundtrip(A16, rng):
    perm = ordering.rcmk(A16)
    Ap = ordering.permute_csr(A16, perm)
    x = rng.standard_normal(A16.shape[0])
    y = np.asarray(rt.spmv(A16, x))
    xp = np.empty_like(x); xp[perm] = x
    yp = np.asarray(rt.spmv(Ap, xp))
    np.testing.assert_allclose(yp[perm], y, rtol=1e-12)


# ---------- factorizations ----------

def test_ilu0_exact_on_tridiag():
    # tridiagonal matrix: ILU(0) == exact LU
    n = 50
    main = 2.0 * np.ones(n)
    off = -1.0 * np.ones(n - 1)
    S = sp.diags([off, main, off], [-1, 0, 1]).tocsr()
    A = rt.CSR.from_coo(*S.tocoo().coords, S.tocoo().data, (n, n))
    L, U = factorize.ilu0(A)
    Ld, Ud = np.asarray(L.to_dense()), np.asarray(U.to_dense())
    np.testing.assert_allclose(Ld @ Ud, S.toarray(), atol=1e-12)


def test_ilu0_pattern_residual(A16):
    L, U = factorize.ilu0(A16)
    S = _to_scipy(A16)
    E = np.asarray(L.to_dense()) @ np.asarray(U.to_dense()) - S.toarray()
    # on the pattern of A the product must match exactly
    mask = S.toarray() != 0
    np.testing.assert_allclose(E[mask], 0, atol=1e-10)


def test_ic0_exact_on_tridiag():
    n = 50
    S = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                 [-1, 0, 1]).tocsr()
    A = rt.CSR.from_coo(*S.tocoo().coords, S.tocoo().data, (n, n))
    L = factorize.ic0(A)
    Ld = np.asarray(L.to_dense())
    np.testing.assert_allclose(Ld @ Ld.T, S.toarray(), atol=1e-12)


def test_ilup_more_fill(A16):
    L0, U0 = factorize.ilu0(A16)
    L1, U1 = factorize.ilup(A16, 1)
    assert L1.nnz + U1.nnz > L0.nnz + U0.nnz
    # ILU(1) should be a better approximation in Frobenius norm
    S = _to_scipy(A16).toarray()
    e0 = np.linalg.norm(
        np.asarray(L0.to_dense()) @ np.asarray(U0.to_dense()) - S)
    e1 = np.linalg.norm(
        np.asarray(L1.to_dense()) @ np.asarray(U1.to_dense()) - S)
    assert e1 < e0


def test_ilut_quality(A16):
    L, U = factorize.ilut(A16, tol=1e-4, max_fill=10)
    S = _to_scipy(A16).toarray()
    e = np.linalg.norm(np.asarray(L.to_dense()) @ np.asarray(U.to_dense()) - S)
    assert e < 0.5 * np.linalg.norm(S)


# ---------- triangular solves ----------

def test_level_schedule_solve(rng):
    n = 80
    Ld = np.tril(rng.standard_normal((n, n))) * (rng.random((n, n)) < 0.2)
    np.fill_diagonal(Ld, 2.0 + rng.random(n))
    L = rt.CSR.from_dense(Ld)
    b = rng.standard_normal(n)
    sched = trisolve.build_schedule(L)
    x = np.asarray(trisolve.solve_schedule(sched, b))
    np.testing.assert_allclose(Ld @ x, b, atol=1e-10)


def test_level_schedule_upper(rng):
    n = 60
    Ud = np.triu(rng.standard_normal((n, n))) * (rng.random((n, n)) < 0.2)
    np.fill_diagonal(Ud, 2.0 + rng.random(n))
    U = rt.CSR.from_dense(Ud)
    b = rng.standard_normal(n)
    sched = trisolve.build_schedule(U)
    x = np.asarray(trisolve.solve_schedule(sched, b))
    np.testing.assert_allclose(Ud @ x, b, atol=1e-10)


def test_trisolve_jacobi_converges(rng):
    # diagonally dominant lower triangular: sweeps converge
    n = 64
    Ld = np.tril(0.1 * rng.standard_normal((n, n))) * (rng.random((n, n)) < 0.3)
    np.fill_diagonal(Ld, 4.0)
    L = rt.CSR.from_dense(Ld)
    b = rng.standard_normal(n)
    x = np.asarray(trisolve.trisolve_jacobi(L, b, sweeps=30))
    np.testing.assert_allclose(Ld @ x, b, atol=1e-8)


# ---------- preconditioned solves (the reference's main oracle) ----------

PRECONDS = {
    "jacobi": jacobi,
    "gs": gs,
    "sgs": sgs,
    "sor": lambda A: sor(A, 1.2),
    "ssor": lambda A: ssor(A, 1.2),
    "ilu0": ilu,
    "ilu1": lambda A: ilu(A, 1),
    "ilut": ilut_precond,
    "itilu0": itilu0,
    "ic0": ic,
    "mcgs": multicolored_gs,
    "mcsgs": multicolored_sgs,
    "mcilu": multicolored_ilu,
    "mcilu_pq": lambda A: multicolored_ilu(A, 1, 2),
}


@pytest.mark.parametrize("name", sorted(PRECONDS))
def test_preconditioned_cg_or_fgmres(name, A16, rng):
    A = A16
    x_true = rng.standard_normal(A.shape[0])
    b = np.asarray(rt.spmv(A, x_true))
    M = PRECONDS[name](A)
    # SPD-preserving preconds use CG; the rest FGMRES
    solver = rt.cg if name in ("jacobi", "sgs", "ssor", "ic0", "mcsgs") else rt.fgmres
    x, info = solver(A, b, M=M, rel_tol=1e-10, max_iter=1000)
    assert bool(info.converged), f"{name}: status={int(info.status)}"
    err = np.linalg.norm(np.asarray(x) - x_true)
    assert err < 1e-5 * max(1.0, np.linalg.norm(x_true)), f"{name}: {err}"


@pytest.mark.parametrize("name", ["ilu0", "ilu1", "ilut", "ic0", "mcilu"])
def test_strong_precond_reduces_iterations(name, A16, rng):
    x_true = rng.standard_normal(A16.shape[0])
    b = np.asarray(rt.spmv(A16, x_true))
    solver = rt.cg if name == "ic0" else rt.fgmres
    _, i_none = solver(A16, b, rel_tol=1e-10, max_iter=2000)
    _, i_pre = solver(A16, b, M=PRECONDS[name](A16), rel_tol=1e-10,
                      max_iter=2000)
    assert int(i_pre.iterations) < int(i_none.iterations) / 2, name


def test_extract_lu_roundtrip(A16):
    L = extract.extract_lower(A16, diag=True)
    U = extract.extract_upper(A16, diag=False)
    S = np.asarray(L.to_dense()) + np.asarray(U.to_dense())
    np.testing.assert_allclose(S, np.asarray(A16.to_dense()), atol=0)


def test_itilu0_inside_jit_no_tracer_leak(rng):
    """Regression (r3, seen on hardware): with WJD auto-attach active, an
    ILU-jacobi apply traced inside a jitted solver built its off-diagonal
    WJD cache DURING tracing, caching tracer arrays on the factor object and
    failing the second call with UnexpectedTracerError. The build must
    prepare the caches eagerly (prepare_offd) and never attach under trace."""
    import jax
    import jax.numpy as jnp

    from rocalution_tpu.config import set_auto_wjd

    A = rt.laplacian_2d(12)
    b = rng.standard_normal(A.shape[0])
    set_auto_wjd(True)        # simulate the TPU default on CPU
    try:
        M = rt.precond.itilu0(A, sweeps=6)
        # factors got their analysis at build time, outside any trace
        from rocalution_tpu.ops.spmv import trace_state_clean
        assert trace_state_clean()

        @jax.jit
        def solve(b):
            x, info = rt.gmres(A, jnp.asarray(b), M=M, rel_tol=1e-8,
                               max_iter=300)
            return x, info.iterations

        x1, _ = solve(b)
        x2, _ = solve(b)      # second call must not see leaked tracers
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))
        err = np.linalg.norm(
            np.asarray(rt.spmv(A, jnp.asarray(np.asarray(x1)))) - b)
        assert err < 1e-6 * np.linalg.norm(b)
    finally:
        set_auto_wjd(None)


def test_bsr_native_factorizations(rng):
    """BCSR-native ILU0/IC0 (reference: rocsparse bsrilu0/bsric0 behind
    hip_matrix_bcsr.cpp:747-786): block-granularity factorization
    numerics — for a block-dense operator with bd covering the full
    bandwidth... here checked three ways: (a) the block-ILU apply equals
    the dense (LU)^{-1} computed by an oracle block factorization, (b) it
    preconditions CG/BiCGStab to convergence, (c) block IC0's flattened
    factor reproduces A on the block pattern for an SPD matrix."""
    import numpy as np
    import scipy.sparse as sp

    import rocalution_tpu as rt
    from rocalution_tpu.ops.factorize import bsric0, bsrilu0
    from rocalution_tpu.precond import bsr_ic0, bsr_ilu0

    A = rt.laplacian_2d(12, dtype=np.float64)   # 144 unknowns
    B = rt.convert(A, "BCSR", block_dim=4)

    # (a) oracle: dense block-ILU0 apply on a small system
    (lv, lc, lr), (uv, uc, ur), dinv = bsrilu0(B)
    n = A.shape[0]
    bd = 4
    # assemble block factors densely
    Ld = np.zeros((n, n))
    Ud = np.zeros((n, n))
    for v, c, r in zip(lv, lc, lr):
        Ld[r*bd:(r+1)*bd, c*bd:(c+1)*bd] = v
    Ld += np.eye(n)
    for v, c, r in zip(uv, uc, ur):
        Ud[r*bd:(r+1)*bd, c*bd:(c+1)*bd] = v
    rhs = rng.standard_normal(n)
    want = np.linalg.solve(Ud, np.linalg.solve(Ld, rhs))
    M = bsr_ilu0(B)
    got = np.asarray(M(rhs))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    # (b) it actually preconditions
    b = np.asarray(rt.spmv(A, np.ones(n)))
    x, info = rt.cg(A, b, M=M, rel_tol=1e-10, max_iter=400)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - 1.0) < 1e-6
    _, info_plain = rt.cg(A, b, rel_tol=1e-10, max_iter=400)
    assert int(info.iterations) < int(info_plain.iterations)

    # iterative-sweep apply mode too
    Mj = bsr_ilu0(B, method="jacobi", sweeps=12)
    xj, infoj = rt.cg(A, b, M=Mj, rel_tol=1e-8, max_iter=400)
    assert bool(infoj.converged)

    # (c) block IC0: for the (no-fill-needed) tridiagonal block case,
    # L_b L_b^T reproduces A exactly on the pattern
    vals, cols, rows = bsric0(B)
    Lfull = np.zeros((n, n))
    for v, c, r in zip(vals, cols, rows):
        Lfull[r*bd:(r+1)*bd, c*bd:(c+1)*bd] = v
    M2 = bsr_ic0(B)
    x2, info2 = rt.cg(A, b, M=M2, rel_tol=1e-10, max_iter=400)
    assert bool(info2.converged)
    assert int(info2.iterations) < int(info_plain.iterations)
