"""Jacobi (diagonal) preconditioner.

Reference parity: Jacobi (src/solvers/preconditioners/preconditioner.cpp —
Build extracts the inverse diagonal; apply = pointwise multiply). The only
preconditioner with Global support in the reference (preconditioner.cpp:
1121-1127) — here it is trivially shardable since the apply is elementwise.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..formats import to_csr


def jacobi(A):
    """Build a Jacobi preconditioner closure r -> D^{-1} r."""
    inv_diag = inverse_diagonal(A)

    def apply(r):
        return inv_diag * r

    return apply


def extract_diagonal(A):
    """Diagonal of A (reference: LocalMatrix::ExtractDiagonal)."""
    from ..formats import CSR, DENSE, DIA, MCSR

    if isinstance(A, DENSE):
        return jnp.diagonal(A.data)
    if isinstance(A, MCSR):
        return A.diag
    if isinstance(A, DIA):
        if 0 in A.offsets:
            return A.data[A.offsets.index(0)]
        return jnp.zeros((min(A.shape),), A.data.dtype)
    csr = A if isinstance(A, CSR) else to_csr(A)
    is_diag = csr.row_ids == csr.indices
    n = min(csr.shape)
    diag = jnp.zeros((n,), csr.data.dtype)
    return diag.at[jnp.where(is_diag, csr.row_ids, 0)].add(
        jnp.where(is_diag, csr.data, 0)
    )


def inverse_diagonal(A):
    # host path when the matrix carries a host cache: setup must not issue
    # eager device ops (each costs a remote compile on this platform)
    host = inverse_diagonal_host(A)
    if host is not None:
        return jnp.asarray(host)
    d = extract_diagonal(A)
    return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 1.0)


def inverse_diagonal_host(A):
    """Numpy inverse diagonal from host caches; None if unavailable."""
    from ..formats import CSR, DIA

    if isinstance(A, DIA):
        from ..formats.base import get_host

        if 0 not in A.offsets:
            return np.ones(min(A.shape))
        d = get_host(A, "data")[A.offsets.index(0), : min(A.shape)]
    elif isinstance(A, CSR) and getattr(A, "_host_cache", None):
        from ..formats.base import get_host

        # raw host views (numpy_triplet's int64 astype copies cost ~0.5 s
        # at 14.6M nnz); CSR stores each diagonal at most once, so direct
        # assignment replaces the slow np.add.at scatter
        data = get_host(A, "data")
        indices = get_host(A, "indices")
        rows = get_host(A, "row_ids")
        d = np.zeros(min(A.shape), data.dtype)
        sel = indices == rows
        d[rows[sel]] = data[sel]
    else:
        return None
    return np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 1.0)
