"""HYB storage format = ELL + COO tail (reference: MatrixHYB, matrix_formats.hpp:133-146)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from .base import (MatrixBase, register_format, set_host_cache, static_field)
from .coo import COO
from .ell import ELL


@register_format
@dataclasses.dataclass(frozen=True)
class HYB(MatrixBase):
    ell: ELL
    coo: COO
    shape: Tuple[int, int] = static_field(default=(0, 0))

    @property
    def dtype(self):
        return self.ell.data.dtype

    @property
    def nnz(self) -> int:
        return self.ell.nnz + self.coo.nnz

    @staticmethod
    def from_csr_host(csr, width: int | None = None) -> "HYB":
        """Split rows at `width` (default: average row nnz, like rocALUTION's
        csr_to_hyb heuristic, host_conversion.cpp)."""
        data, indices, indptr = csr.numpy_triplet()
        nrow, ncol = csr.shape
        counts = np.diff(indptr)
        if width is None:
            width = max(1, int(np.ceil(counts.mean()))) if nrow else 1
        width = int(width)
        pos = np.arange(len(data)) - np.repeat(indptr[:-1], counts)
        rows = np.repeat(np.arange(nrow, dtype=np.int64), counts)
        in_ell = pos < width
        ell_data = np.zeros((nrow, width), dtype=data.dtype)
        ell_ind = np.full((nrow, width), -1, dtype=np.int32)
        ell_data[rows[in_ell], pos[in_ell]] = data[in_ell]
        ell_ind[rows[in_ell], pos[in_ell]] = indices[in_ell]
        tail = ~in_ell
        ell = ELL(data=_j(ell_data), indices=_j(ell_ind), shape=(nrow, ncol))
        set_host_cache(ell, data=ell_data, indices=ell_ind)
        coo = COO.from_arrays(rows[tail], indices[tail], data[tail], (nrow, ncol))
        return HYB(ell=ell, coo=coo, shape=(nrow, ncol))

    def to_dense(self):
        return self.ell.to_dense() + self.coo.to_dense()


def _j(a):
    import jax.numpy as jnp

    return jnp.asarray(a)
