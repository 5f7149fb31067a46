"""COO storage format (reference: MatrixCOO struct, matrix_formats.hpp:69-80)."""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .base import (MatrixBase, get_host, register_format, set_host_cache,
                   static_field)


@register_format
@dataclasses.dataclass(frozen=True)
class COO(MatrixBase):
    data: jnp.ndarray  # (nnz,)
    row: jnp.ndarray   # (nnz,) int32
    col: jnp.ndarray   # (nnz,) int32
    shape: Tuple[int, int] = static_field(default=(0, 0))

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @staticmethod
    def from_arrays(row, col, data, shape) -> "COO":
        out = COO(
            data=jnp.asarray(data),
            row=jnp.asarray(row, dtype=jnp.int32),
            col=jnp.asarray(col, dtype=jnp.int32),
            shape=(int(shape[0]), int(shape[1])),
        )
        if isinstance(data, np.ndarray) or not hasattr(data, "aval"):
            set_host_cache(
                out,
                data=np.asarray(data),
                row=np.asarray(row, dtype=np.int64),
                col=np.asarray(col, dtype=np.int64),
            )
        return out

    @staticmethod
    def from_dense(dense) -> "COO":
        d = np.asarray(dense)
        r, c = np.nonzero(d)
        return COO.from_arrays(r, c, d[r, c], d.shape)

    def to_dense(self) -> jnp.ndarray:
        out = jnp.zeros(self.shape, dtype=self.data.dtype)
        return out.at[self.row, self.col].add(self.data)
