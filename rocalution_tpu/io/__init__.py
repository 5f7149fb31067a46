"""IO: MatrixMarket text + versioned binary containers (reference:
host_io.cpp MTX, rocsparseio binary, multinode per-rank layout)."""

from .binary import (read_csr, read_global_csr, read_vector, write_csr,
                     write_global_csr, write_vector)
from .mtx import read_mtx, read_mtx_vector, write_mtx
from .rocsparseio import (read_rocsparseio,
                          read_vector_rocsparseio,
                          write_rocsparseio,
                          write_vector_rocsparseio)

__all__ = [
    "read_csr", "read_global_csr", "read_mtx", "read_mtx_vector",
    "read_rocsparseio", "read_vector", "read_vector_rocsparseio",
    "write_csr", "write_global_csr",
    "write_mtx", "write_rocsparseio", "write_vector",
    "write_vector_rocsparseio",
]
