"""DENSE format (reference: MatrixDENSE, matrix_formats.hpp:149-156).

Used by direct solvers (LU/QR/Inversion) and coarse-grid AMG solves; on TPU a
dense matrix is where the MXU shines, so no special storage tricks needed.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from .base import MatrixBase, register_format, static_field


@register_format
@dataclasses.dataclass(frozen=True)
class DENSE(MatrixBase):
    data: jnp.ndarray  # (nrow, ncol)
    shape: Tuple[int, int] = static_field(default=(0, 0))

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0] * self.data.shape[1])

    @staticmethod
    def from_array(a) -> "DENSE":
        a = jnp.asarray(a)
        return DENSE(data=a, shape=(int(a.shape[0]), int(a.shape[1])))

    @staticmethod
    def from_csr_host(csr) -> "DENSE":
        return DENSE.from_array(csr.to_dense())

    def to_dense(self) -> jnp.ndarray:
        return self.data
