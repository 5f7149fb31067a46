"""Spectral utilities: Gershgorin bounds and the power method.

Reference parity: LocalMatrix::Gershgorin (src/base/local_matrix.hpp:1074,
host kernel in host_matrix_csr.cpp) — circle-theorem eigenvalue bounds used
to feed Chebyshev solvers/AIChebyshev preconditioners — and the power-method
sample (clients/samples/power-method.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats import CSR, to_csr
from .spmv import as_operator


def gershgorin(A):
    """(lambda_min, lambda_max) bounds from Gershgorin circles.

    Returns scalars: min_i (a_ii - R_i), max_i (a_ii + R_i) where R_i is the
    off-diagonal absolute row sum.
    """
    csr = A if isinstance(A, CSR) else to_csr(A)
    n = csr.shape[0]
    is_diag = csr.row_ids == csr.indices
    diag = jax.ops.segment_sum(
        jnp.where(is_diag, csr.data, 0), csr.row_ids, num_segments=n,
        indices_are_sorted=True,
    )
    radius = jax.ops.segment_sum(
        jnp.where(is_diag, 0.0, jnp.abs(csr.data)), csr.row_ids,
        num_segments=n, indices_are_sorted=True,
    )
    d = jnp.real(diag)
    return jnp.min(d - radius), jnp.max(d + radius)


def power_method(A, *, iters: int = 100, seed: int = 0, x0=None):
    """Dominant eigenvalue estimate by `iters` power iterations
    (reference: clients/samples/power-method.cpp pattern)."""
    op = as_operator(A)
    n = A.shape[0] if hasattr(A, "shape") else x0.shape[0]
    if x0 is None:
        x0 = jax.random.normal(jax.random.PRNGKey(seed), (n,))
    x = x0 / jnp.linalg.norm(x0)

    def body(_, carry):
        x, lam = carry
        y = op(x)
        lam = jnp.vdot(x, y)
        return (y / jnp.linalg.norm(y), lam)

    x, lam = jax.lax.fori_loop(0, iters, body, (x, jnp.zeros((), x.dtype)))
    return jnp.real(lam), x
