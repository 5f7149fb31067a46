"""Matrix-free stencil sample (reference: clients/samples/stencil.cpp)."""

import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import rocalution_tpu as rt

st = rt.laplace2d_stencil(100)
print(f"stencil: grid={st.grid} ndim={st.ndim} n={st.shape[0]}")
b = np.asarray(rt.spmv(st, np.ones(st.shape[0])))
x, info = rt.cg(st, b, rel_tol=1e-8, max_iter=2000)
print(f"CG on stencil: iters={int(info.iterations)} "
      f"err={np.linalg.norm(np.asarray(x)-1):.2e}")
