"""MCSR (modified CSR, diagonal stored separately; reference: MatrixMCSR,
matrix_formats.hpp:69 region; used by multi-colored ILU solves)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .base import (MatrixBase, get_host, register_format, set_host_cache,
                   static_field)
from .csr import CSR


@register_format
@dataclasses.dataclass(frozen=True)
class MCSR(MatrixBase):
    diag: jnp.ndarray   # (nrow,) diagonal values
    offd: CSR           # off-diagonal part as CSR
    shape: Tuple[int, int] = static_field(default=(0, 0))

    @property
    def dtype(self):
        return self.diag.dtype

    @property
    def nnz(self) -> int:
        return int(self.diag.shape[0]) + self.offd.nnz

    @staticmethod
    def from_csr_host(csr) -> "MCSR":
        data, indices, indptr = csr.numpy_triplet()
        nrow, ncol = csr.shape
        rows = np.repeat(np.arange(nrow, dtype=np.int64), np.diff(indptr))
        is_diag = rows == indices
        diag = np.zeros(nrow, dtype=data.dtype)
        diag[rows[is_diag]] = data[is_diag]
        offd = CSR.from_coo(rows[~is_diag], indices[~is_diag], data[~is_diag],
                            (nrow, ncol))
        out = MCSR(diag=jnp.asarray(diag), offd=offd, shape=(nrow, ncol))
        set_host_cache(out, diag=diag)
        return out

    def to_dense(self) -> jnp.ndarray:
        out = self.offd.to_dense()
        n = min(self.shape)
        idx = jnp.arange(n)
        return out.at[idx, idx].add(self.diag[:n])
