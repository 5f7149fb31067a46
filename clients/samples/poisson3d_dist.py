"""3D Poisson at scale via the DISTRIBUTED setup route — the BASELINE
ladder's 256^3 row (16.78M unknowns).

The fine operator is never assembled globally: each part generates its own
row block (laplacian_3d_block), the SA-AMG hierarchy is built by the
distributed setup (boundary-row exchanges, sharded coarse solve —
parallel/amg_setup.py), and the solve is CG preconditioned by the sharded
V-cycle over the mesh. Reference flow: cg-amg_mpi with distribute_matrix
(clients/samples/cg-amg_mpi.cpp + global AMG build,
global_matrix.cpp:4041-4311).

Captured 8-part run (BASELINE.md "256³ scale row"): setup 412 s,
5 levels 16.8M→2.1M→135k→5.5k→304, CG+distAMG 11 iterations,
rms err 1.75e-6. PARTS=1 on a single chip stops at the scoped-VMEM
limit (~4M rows/chip: the kernel keeps each shard's x VMEM-resident) —
the row partition across chips is the point of this sample.

Env knobs:
  POISSON_N   edge size (default 256 -> 16.78M unknowns)
  PARTS       mesh size (default 8; CPU runs want
              XLA_FLAGS=--xla_force_host_platform_device_count=8)
  DTYPE       float32 (default; memory at this scale) | float64
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

import jax

import rocalution_tpu as rt  # noqa: E402
from rocalution_tpu.parallel import (dist_amg_solve_sharded,  # noqa: E402
                                     distributed_amg_setup, make_mesh)
from rocalution_tpu.parallel.amg_setup import _offsets  # noqa: E402
from rocalution_tpu.solvers.krylov.cg import cg  # noqa: E402
from rocalution_tpu.utils.generators import laplacian_3d_block  # noqa: E402

n = int(os.environ.get("POISSON_N", "256"))
P = int(os.environ.get("PARTS", "8"))
dtype = np.dtype(os.environ.get("DTYPE", "float32"))
N = n ** 3
P = min(P, len(jax.devices()))
print(f"3D Poisson {n}^3 = {N:,} unknowns, {P} parts, {dtype.name}, "
      f"backend={jax.default_backend()}", flush=True)

offs = _offsets(P, N)
t0 = time.perf_counter()
blocks = [laplacian_3d_block(n, int(offs[q]), int(offs[q + 1]), dtype=dtype)
          for q in range(P)]
nnz = sum(len(b[2]) for b in blocks)
print(f"blocks generated: nnz={nnz:,} ({time.perf_counter()-t0:.1f}s)",
      flush=True)

t0 = time.perf_counter()
dl = distributed_amg_setup(blocks, (N, N), coarse_size=2000,
                           strategy="auto")
t_setup = time.perf_counter() - t0
sizes = [int(A.n_global) for A in dl.As]
print(f"distributed SA-AMG setup: {t_setup:.1f}s, levels={sizes}",
      flush=True)

# b = A @ 1 assembled from the blocks alone
b = np.zeros(N, dtype)
for q, (r, c, d) in enumerate(blocks):
    np.add.at(b, r + int(offs[q]), d)

t0 = time.perf_counter()
x, info = dist_amg_solve_sharded(cg, dl, b, mesh=make_mesh(P),
                                 rel_tol=1e-6, max_iter=60)
x = np.asarray(x)
t_solve = time.perf_counter() - t0
err = float(np.linalg.norm(x - 1.0) / np.sqrt(N))
print(f"CG+distAMG: iters={int(info.iterations)} status={int(info.status)} "
      f"solve={t_solve:.1f}s rms_err={err:.2e}", flush=True)
assert int(info.status) in (1, 2), "did not converge"
assert err < 1e-3
