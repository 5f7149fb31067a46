"""Format storage + conversion tests (reference analog: test_local_matrix.cpp
conversion coverage)."""

import numpy as np
import pytest

import rocalution_tpu as rt
from rocalution_tpu.formats import convert, to_csr

FORMATS = ["CSR", "COO", "ELL", "DIA", "HYB", "BCSR", "MCSR", "DENSE"]


def dense_of(mat):
    return np.asarray(mat.to_dense())


@pytest.fixture(scope="module")
def A():
    return rt.laplacian_2d(7)


@pytest.mark.parametrize("fmt", FORMATS)
def test_convert_roundtrip(A, fmt):
    ref = dense_of(A)
    B = convert(A, fmt)
    np.testing.assert_allclose(dense_of(B), ref, atol=1e-14)
    # round-trip back to CSR
    C = to_csr(B)
    np.testing.assert_allclose(dense_of(C), ref, atol=1e-14)


@pytest.mark.parametrize("fmt", FORMATS)
def test_spmv_matches_dense(A, fmt, rng):
    ref = dense_of(A)
    x = rng.standard_normal(A.shape[1])
    B = convert(A, fmt)
    y = np.asarray(rt.spmv(B, x))
    np.testing.assert_allclose(y, ref @ x, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("fmt", ["CSR", "COO", "ELL", "BCSR", "DENSE"])
def test_spmm_multiple_rhs(A, fmt, rng):
    ref = dense_of(A)
    X = rng.standard_normal((A.shape[1], 3))
    B = convert(A, fmt)
    Y = np.asarray(rt.spmv(B, X))
    np.testing.assert_allclose(Y, ref @ X, rtol=1e-12, atol=1e-12)


def test_nnz_counts(A):
    n = 7
    expected = 5 * n * n - 4 * n  # 5-point stencil minus boundary
    assert A.nnz == expected
    assert convert(A, "ELL").nnz == expected
    assert convert(A, "DIA").nnz == expected
    assert convert(A, "HYB").nnz == expected


def test_rectangular_csr(rng):
    d = rng.standard_normal((5, 9))
    d[np.abs(d) < 0.7] = 0
    A = rt.CSR.from_dense(d)
    x = rng.standard_normal(9)
    np.testing.assert_allclose(np.asarray(rt.spmv(A, x)), d @ x, rtol=1e-12)


def test_transpose_host(A, rng):
    At = A.transpose_host()
    np.testing.assert_allclose(dense_of(At), dense_of(A).T, atol=0)
