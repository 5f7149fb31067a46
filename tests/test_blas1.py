"""BLAS-1 op tests (reference analog: test_local_vector.cpp)."""

import numpy as np

from rocalution_tpu.ops import blas1


def test_blas1_ops(rng):
    x = rng.standard_normal(100)
    y = rng.standard_normal(100)
    np.testing.assert_allclose(float(blas1.dot(x, y)), x @ y)
    np.testing.assert_allclose(float(blas1.norm(x)), np.linalg.norm(x))
    np.testing.assert_allclose(float(blas1.asum(x)), np.abs(x).sum())
    idx, val = blas1.amax(x)
    assert int(idx) == int(np.argmax(np.abs(x)))
    np.testing.assert_allclose(np.asarray(blas1.add_scale(x, y, 2.0)), x + 2 * y)
    np.testing.assert_allclose(np.asarray(blas1.scale_add(x, y, 2.0)), 2 * x + y)
    np.testing.assert_allclose(
        np.asarray(blas1.scale_add_scale(x, y, 2.0, 3.0)), 2 * x + 3 * y
    )
    np.testing.assert_allclose(np.asarray(blas1.pointwise_mult(x, y)), x * y)
    np.testing.assert_allclose(np.asarray(blas1.inclusive_sum(x)), np.cumsum(x))
    np.testing.assert_allclose(
        np.asarray(blas1.exclusive_sum(x)), np.cumsum(x) - x
    )


def test_complex_dot():
    x = np.array([1 + 2j, 3 - 1j])
    y = np.array([2 - 1j, 1 + 1j])
    np.testing.assert_allclose(complex(blas1.dot(x, y)), np.vdot(x, y))
    np.testing.assert_allclose(complex(blas1.dot_nonconj(x, y)), (x * y).sum())


def test_permute(rng):
    x = rng.standard_normal(10)
    perm = rng.permutation(10)
    fwd = np.asarray(blas1.permute(x, perm))
    assert np.allclose(fwd[perm], x)
    back = np.asarray(blas1.permute_backward(fwd, perm))
    np.testing.assert_allclose(back, x)
