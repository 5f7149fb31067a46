"""CG solver tests — manufactured-solution oracle from the reference
(clients/include/testing_cg.hpp:28-38: b = A @ 1, random x0, final error
< 1e-6 for fp64)."""

import jax
import numpy as np
import pytest

import rocalution_tpu as rt


@pytest.mark.parametrize("fmt", ["CSR", "ELL", "DIA", "HYB", "COO"])
def test_cg_laplacian_formats(fmt, rng):
    A = rt.convert(rt.laplacian_2d(16), fmt)
    n = A.shape[0]
    ones = np.ones(n)
    b = np.asarray(rt.spmv(A, ones))
    x0 = rng.standard_normal(n)
    x, info = rt.cg(A, b, x0, rel_tol=1e-10, max_iter=1000)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - ones) < 1e-6


def test_cg_jacobi_preconditioned(rng):
    A = rt.laplacian_2d(16)
    ones = np.ones(A.shape[0])
    b = np.asarray(rt.spmv(A, ones))
    M = rt.jacobi(A)
    x, info = rt.cg(A, b, M=M, rel_tol=1e-10)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - ones) < 1e-6


def test_cg_under_jit(rng):
    A = rt.laplacian_2d(10)
    b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))

    @jax.jit
    def solve(A, b):
        return rt.cg(A, b, rel_tol=1e-10)

    x, info = solve(A, b)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - 1.0) < 1e-6


def test_cg_history_monotone_tail(rng):
    A = rt.laplacian_2d(8)
    b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
    x, info = rt.cg(A, b, rel_tol=1e-8, max_iter=200, record_history=True)
    hist = np.asarray(info.history)
    hist = hist[~np.isnan(hist)]
    assert hist[0] == float(info.init_res)
    assert hist[-1] == float(info.final_res)
    assert len(hist) == int(info.iterations) + 1
    # relative drop achieved
    assert hist[-1] / hist[0] <= 1e-8


def test_cg_statuses():
    A = rt.laplacian_2d(8)
    b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
    # max-iter status
    x, info = rt.cg(A, b, rel_tol=1e-14, max_iter=3)
    assert int(info.status) == 4 and int(info.iterations) == 3
    # zero RHS with zero x0: init residual 0 -> absolute criterion at init
    x, info = rt.cg(A, np.zeros_like(b), abs_tol=1e-15)
    assert int(info.status) == 1 and int(info.iterations) == 0


def test_cg_matrix_free():
    # LocalStencil-style matrix-free operator: same Laplacian via jnp ops
    import jax.numpy as jnp

    n = 12
    A = rt.laplacian_2d(n)
    b = np.asarray(rt.spmv(A, np.ones(n * n)))

    def op(x):
        g = x.reshape(n, n)
        y = 4 * g
        y = y.at[1:, :].add(-g[:-1, :])
        y = y.at[:-1, :].add(-g[1:, :])
        y = y.at[:, 1:].add(-g[:, :-1])
        y = y.at[:, :-1].add(-g[:, 1:])
        return y.reshape(-1)

    x, info = rt.cg(op, b, rel_tol=1e-10)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - 1.0) < 1e-6
