"""Distributed algebraic multigrid.

Reference parity: the Global instantiation of BaseAMG/BaseMultiGrid —
distributed hierarchies with per-level halo exchange (global_matrix.cpp
boundary-row machinery + base_amg.cpp Global template instantiations,
base_amg.cpp:449-456).

TPU-native design: the hierarchy is *built* once on the host from the global
matrix (setup phase — the reference's BuildHierarchy is likewise a setup
sweep), then every level's operator and transfer (P/R are rectangular: rows
on the fine partition, columns on the coarse partition) is row-partitioned
into GlobalCSR shards — including the COARSEST level, which is solved by a
fixed-step Jacobi-CG inside the cycle (round 2's replicated dense inverse
is gone). The whole preconditioned Krylov solve — smoothing, restriction,
prolongation, coarse iterations, and the outer solver — runs as ONE
`shard_map` program over the mesh; every halo exchange is the
neighbor-sparse ppermute path.

For building the hierarchy FROM sharded data (no host-side global matrix),
see parallel/amg_setup.py (distributed_amg_setup).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..solvers.iter_ctrl import SolverInfo
from ..solvers.multigrid import Hierarchy, amg_hierarchy
from .ops import shard_operator, shard_spmv
from .partition import GlobalCSR, distribute_csr, distribute_vector, gather_vector
from .solve import AXIS, _info_struct, make_mesh


class DistMG(NamedTuple):
    """Distributed hierarchy operands (a pytree passed through shard_map)."""

    As: Tuple[GlobalCSR, ...]      # operators per level incl. the coarsest
    Ps: Tuple[GlobalCSR, ...]      # prolongations (fine rows, coarse cols)
    Rs: Tuple[GlobalCSR, ...]      # restrictions (coarse rows, fine cols)
    inv_diags: Tuple[jnp.ndarray, ...]   # (P, nl) per level incl. coarsest


def _stacked_inv_diag(A, nparts: int, nl: int) -> jnp.ndarray:
    d, i, p = A.numpy_triplet()
    rows = A.numpy_rows()
    diag = np.zeros(A.shape[0], d.dtype)
    np.add.at(diag, rows[i == rows], d[i == rows])
    dpad = np.ones(nparts * nl, d.dtype)
    dpad[: len(diag)] = np.where(diag != 0, diag, 1.0)
    return jnp.asarray((1.0 / dpad).reshape(nparts, nl))


def distribute_hierarchy(h: Hierarchy, nparts: int) -> DistMG:
    """Shard a host-built hierarchy over `nparts` partitions. The coarsest
    level is sharded like every other level and solved iteratively inside
    the cycle — no replicated dense inverse (which cost O(nc^2) memory per
    shard in round 2)."""
    As, Ps, Rs, invds = [], [], [], []
    for lv in h.levels[:-1]:
        Ag = distribute_csr(lv.A, nparts)
        As.append(Ag)
        Ps.append(distribute_csr(lv.P, nparts))
        Rs.append(distribute_csr(lv.R, nparts))
        invds.append(_stacked_inv_diag(lv.A, nparts, Ag.n_local))

    Ac = h.levels[-1].A
    Acg = distribute_csr(Ac, nparts)
    As.append(Acg)
    invds.append(_stacked_inv_diag(Ac, nparts, Acg.n_local))
    return DistMG(tuple(As), tuple(Ps), tuple(Rs), tuple(invds))


def _dist_cycle(dh: DistMG, axis_name: str, *, omega: float = 2.0 / 3.0,
                pre: int = 1, post: int = 2,
                coarse_iters: int = 24) -> Callable:
    """Per-shard V-cycle closure (call inside shard_map). Coarsest solve =
    fixed-step Jacobi-CG on the SHARDED coarse operator (static shapes,
    no replicated dense inverse)."""
    nlev = len(dh.Ps)

    def smooth(l, b, x, sweeps):
        invd = dh.inv_diags[l][0]
        for _ in range(sweeps):
            x = x + omega * invd * (b - shard_spmv(dh.As[l], x, axis_name))
        return x

    def coarse_solve(b):
        invd = dh.inv_diags[-1][0]
        A = dh.As[-1]

        def body(_, carry):
            x, r, pvec, rho = carry
            q = shard_spmv(A, pvec, axis_name)
            den = jax.lax.psum(jnp.sum(pvec * q), axis_name)
            alpha = jnp.where(den == 0, 0.0,
                              rho / jnp.where(den == 0, 1.0, den))
            x = x + alpha * pvec
            r = r - alpha * q
            z = invd * r
            rho_n = jax.lax.psum(jnp.sum(r * z), axis_name)
            beta = jnp.where(rho == 0, 0.0,
                             rho_n / jnp.where(rho == 0, 1.0, rho))
            return x, r, z + beta * pvec, rho_n

        z0 = invd * b
        rho0 = jax.lax.psum(jnp.sum(b * z0), axis_name)
        x, _, _, _ = jax.lax.fori_loop(
            0, coarse_iters, body, (jnp.zeros_like(b), b, z0, rho0))
        return x

    def cycle(l, b):
        if l == nlev:
            return coarse_solve(b)
        x = smooth(l, b, jnp.zeros_like(b), pre)
        res = b - shard_spmv(dh.As[l], x, axis_name)
        rc = shard_spmv(dh.Rs[l], res, axis_name)
        e = cycle(l + 1, rc)
        x = x + shard_spmv(dh.Ps[l], e, axis_name)
        return smooth(l, b, x, post)

    return lambda r: cycle(0, r)


def dist_amg_solve(solver: Callable, A, b, nparts: int, *,
                   mesh: Optional[Mesh] = None, kind: str = "sa",
                   hierarchy: Optional[Hierarchy] = None,
                   amg_kwargs: Optional[dict] = None, **solver_kwargs):
    """Distributed AMG-preconditioned solve: host hierarchy build, fully
    sharded solve (reference: the cg-amg_mpi sample flow).

    `A` is the global host CSR; `solver` any rocalution_tpu Krylov solver.
    Returns (x, SolverInfo).
    """
    h = hierarchy or amg_hierarchy(A, kind, **(amg_kwargs or {}))
    if h.num_levels < 2:
        raise ValueError(
            "dist_amg_solve: hierarchy has a single level (matrix already "
            "at/below coarse_size, so no coarse grids were built) — use "
            "dist_solve with a block_jacobi preconditioner instead"
        )
    dh = distribute_hierarchy(h, nparts)
    Ag = dh.As[0]
    if mesh is None:
        mesh = make_mesh(nparts)
    bp = distribute_vector(np.asarray(b), nparts, Ag.n_local)

    def shard_fn(dh, b_l):
        op = shard_operator(dh.As[0], AXIS)
        M = _dist_cycle(dh, AXIS)
        x, info = solver(op, b_l[0], None, M, axis_name=AXIS,
                         **solver_kwargs)
        return x[None], jax.tree.map(lambda v: jnp.asarray(v)[None], info)

    def spec_of(leaf_owner):
        return jax.tree.map(lambda _: P(AXIS), leaf_owner)

    in_specs = (
        DistMG(
            As=spec_of(dh.As), Ps=spec_of(dh.Ps), Rs=spec_of(dh.Rs),
            inv_diags=spec_of(dh.inv_diags),
        ),
        P(AXIS),
    )
    out_specs = (P(AXIS), jax.tree.map(lambda _: P(AXIS), _info_struct()))
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    xp, info_stacked = fn(dh, bp)
    info = jax.tree.map(lambda v: v[0], info_stacked)
    return gather_vector(xp, Ag.n_global), info
