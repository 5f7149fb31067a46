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


def test_restriction_prolongation_by_map(rng):
    """Map-based vector restriction/prolongation (-1 = unmapped;
    reference host_vector.cpp:1415-1462 semantics)."""
    import jax.numpy as jnp
    from rocalution_tpu.ops.blas1 import prolongation, restriction

    fmap = np.array([0, 1, -1, 1, 2, -1, 0], np.int32)
    x = np.arange(1.0, 8.0)
    got = np.asarray(restriction(jnp.asarray(x), jnp.asarray(fmap), 3))
    np.testing.assert_allclose(got, [1 + 7, 2 + 4, 5])
    xc = np.array([10.0, 20.0, 30.0])
    got = np.asarray(prolongation(jnp.asarray(xc), jnp.asarray(fmap)))
    np.testing.assert_allclose(got, [10, 20, 0, 20, 30, 0, 10])


def test_random_fills():
    import jax
    from rocalution_tpu.ops.blas1 import (set_random_normal,
                                          set_random_uniform)

    k = jax.random.PRNGKey(0)
    u = np.asarray(set_random_uniform(k, 5000, low=2.0, high=3.0))
    assert (u >= 2.0).all() and (u < 3.0).all()
    assert abs(u.mean() - 2.5) < 0.05
    g = np.asarray(set_random_normal(k, 5000, mean=1.0, std=2.0))
    assert abs(g.mean() - 1.0) < 0.15 and abs(g.std() - 2.0) < 0.15


def test_extract_coarse_mapping_boundary():
    from rocalution_tpu.ops.blas1 import (extract_coarse_boundary,
                                          extract_coarse_mapping)

    agg = np.array([0, 0, 1, 2, 2, 3], np.int32)   # fine -> coarse map
    bnd = np.array([4, 1, 5, 0], np.int64)         # boundary fine points
    m, k = extract_coarse_mapping(agg, bnd, 4)
    # coarse ids hit: 2, 0, 3, 0 -> local numbering 0,1,2,1
    np.testing.assert_array_equal(m, [0, 1, 2, 1])
    assert k == 3
    np.testing.assert_array_equal(extract_coarse_boundary(agg, bnd, 4),
                                  [2, 0, 3])
