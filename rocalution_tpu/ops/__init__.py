"""Kernel-level operations (the BaseMatrix/BaseVector op surface)."""

from . import (blas1, extract, factorize, ordering, spectral, spgemm, spmv,
               trisolve)  # noqa: F401
