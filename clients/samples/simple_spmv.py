"""Simple SpMV sample (reference: clients/samples/simple-spmv.cpp):
build a matrix, convert formats, apply, compare."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

A = rt.laplacian_2d(40)
x = np.random.default_rng(0).standard_normal(A.shape[0])
y_ref = np.asarray(rt.spmv(A, x))
for fmt in ("COO", "ELL", "DIA", "HYB", "BCSR", "MCSR"):
    B = rt.convert(A, fmt)
    err = np.linalg.norm(np.asarray(rt.spmv(B, x)) - y_ref)
    print(f"{fmt:5s} n={A.shape[0]} nnz={A.nnz}  |y - y_csr| = {err:.2e}")
