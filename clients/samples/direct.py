"""Dense direct solver sample (reference: clients/samples/direct.cpp):
LU / QR / explicit inversion on a small dense system."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt
from rocalution_tpu.solvers.direct import inversion, lu, qr

A = rt.laplacian_2d(12)          # 144x144, solved densely
ones = np.ones(A.shape[0])
b = np.asarray(rt.spmv(A, ones))
for name, solver in (("lu", lu), ("qr", qr), ("inversion", inversion)):
    x, info = solver(A, b)
    print(f"{name:9s} err={np.linalg.norm(np.asarray(x)-1):.2e} "
          f"status={int(info.status)}")
