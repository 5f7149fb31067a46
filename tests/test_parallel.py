"""Distributed-path tests on the 8-device virtual CPU mesh — automated
multi-rank coverage (improves on the reference, SURVEY.md §4 gap)."""

import jax
import numpy as np
import pytest

import rocalution_tpu as rt
from rocalution_tpu.parallel import (block_jacobi_diag, dist_solve,
                                     distribute_csr, distribute_vector,
                                     gather_vector, make_mesh, shard_spmv)
from rocalution_tpu.solvers.krylov.cg import cg

NP = 4


@pytest.fixture(scope="module")
def problem():
    A = rt.laplacian_2d(12)  # 144 unknowns, not divisible by 4? 144/4=36 ok
    x_true = np.ones(A.shape[0])
    b = np.asarray(rt.spmv(A, x_true))
    return A, b, x_true


def test_partition_roundtrip_spmv(problem, rng):
    A, b, _ = problem
    Ag = distribute_csr(A, NP)
    assert Ag.nnz == A.nnz
    x = rng.standard_normal(A.shape[0])
    xp = distribute_vector(x, NP, Ag.n_local)
    mesh = make_mesh(NP)
    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        lambda Ash, xs: shard_spmv(Ash, xs[0], "p")[None],
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("p"), Ag), P("p")),
        out_specs=P("p"),
    )
    yp = fn(Ag, xp)
    y = np.asarray(gather_vector(yp, Ag.n_global))
    np.testing.assert_allclose(y, np.asarray(rt.spmv(A, x)), rtol=1e-12)


def test_dist_cg_matches_serial(problem):
    A, b, x_true = problem
    Ag = distribute_csr(A, NP)
    x, info = dist_solve(cg, Ag, b, rel_tol=1e-10, max_iter=500)
    assert int(info.status) in (1, 2)
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-6
    # iteration count parity with serial CG
    _, sinfo = rt.cg(A, b, rel_tol=1e-10, max_iter=500)
    assert abs(int(info.iterations) - int(sinfo.iterations)) <= 1


def test_dist_cg_jacobi(problem):
    A, b, x_true = problem
    Ag = distribute_csr(A, NP)
    M = block_jacobi_diag(Ag)
    x, info = dist_solve(cg, Ag, b, M=M, rel_tol=1e-10, max_iter=500)
    assert int(info.status) in (1, 2)
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-6


def test_uneven_partition(rng):
    # n=100 over 8 parts -> padding rows exercised
    A = rt.utils.generators.random_spd(100, density=0.06, seed=3)
    x_true = rng.standard_normal(100)
    b = np.asarray(rt.spmv(A, x_true))
    Ag = distribute_csr(A, 8)
    x, info = dist_solve(cg, Ag, b, rel_tol=1e-12, max_iter=2000)
    assert int(info.status) in (1, 2)
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-5 * max(
        1, np.linalg.norm(x_true)
    )


@pytest.mark.parametrize(
    "solver",
    [rt.cg, rt.cr, rt.fcg, rt.bicgstab, rt.bicgstabl, rt.gmres, rt.fgmres,
     rt.idr, rt.qmrcgstab],
)
def test_dist_solver_family(problem, solver):
    """Every Krylov solver serves the Global instantiation through the same
    code path (reference: per-solver Global template instantiations)."""
    A, b, x_true = problem
    Ag = distribute_csr(A, NP)
    M = block_jacobi_diag(Ag)
    x, info = dist_solve(solver, Ag, b, M=M, rel_tol=1e-9, max_iter=2000)
    assert int(info.status) in (1, 2), solver.__name__
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-5, solver.__name__


def test_neighbor_sparse_mode(problem, rng):
    """ppermute neighbor exchange must match the all_gather fallback and be
    selected for banded partitions (the reference's neighbor-sparse
    property)."""
    A, b, x_true = problem
    Ag_pp = distribute_csr(A, NP)
    assert Ag_pp.mode == "ppermute" and len(Ag_pp.shifts) <= 2, (
        Ag_pp.mode, Ag_pp.shifts)
    Ag_ag = distribute_csr(A, NP, max_neighbor_shifts=0)
    assert Ag_ag.mode == "allgather"
    x = rng.standard_normal(A.shape[0])
    xp = distribute_vector(x, NP, Ag_pp.n_local)
    mesh = make_mesh(NP)
    from jax.sharding import PartitionSpec as P

    def run(Ag):
        fn = jax.shard_map(
            lambda Ash, xs: shard_spmv(Ash, xs[0], "p")[None],
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("p"), Ag), P("p")),
            out_specs=P("p"),
        )
        return np.asarray(gather_vector(fn(Ag, xp), Ag.n_global))

    y_ref = np.asarray(rt.spmv(A, x))
    np.testing.assert_allclose(run(Ag_pp), y_ref, rtol=1e-12)
    np.testing.assert_allclose(run(Ag_ag), y_ref, rtol=1e-12)


def test_neighbor_sparse_dist_solve(problem):
    A, b, x_true = problem
    Ag = distribute_csr(A, NP)
    assert Ag.mode == "ppermute"
    x, info = dist_solve(rt.cg, Ag, b, M=block_jacobi_diag(Ag),
                         rel_tol=1e-10, max_iter=500)
    assert int(info.status) in (1, 2)
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-6


@pytest.mark.parametrize("kind", ["sa", "ua", "rs"])
def test_dist_amg(problem, kind):
    """Distributed AMG-preconditioned CG: converges and matches the serial
    hierarchy iterate-for-iterate (same hierarchy, sharded execution)."""
    from rocalution_tpu.parallel import dist_amg_solve
    from rocalution_tpu.solvers.multigrid import amg_precond

    A, b, x_true = problem
    x, info = dist_amg_solve(rt.cg, A, b, NP, kind=kind,
                             amg_kwargs={"coarse_size": 40},
                             rel_tol=1e-10, max_iter=200)
    assert int(info.status) in (1, 2), kind
    assert np.linalg.norm(np.asarray(x) - x_true) < 1e-6, kind
    _, sinfo = rt.cg(A, b, M=amg_precond(A, kind, coarse_size=40),
                     rel_tol=1e-10, max_iter=200)
    assert abs(int(info.iterations) - int(sinfo.iterations)) <= 2, (
        kind, int(info.iterations), int(sinfo.iterations))


def test_dist_rect_spmv(problem, rng):
    """Rectangular distributed operators (AMG transfers)."""
    from jax.sharding import PartitionSpec as P

    A, _, _ = problem
    from rocalution_tpu.solvers.multigrid.aggregation import sa_level

    Pm, Rm, Ac = sa_level(A)
    Pg = distribute_csr(Pm, NP)
    xc = rng.standard_normal(Pm.shape[1])
    xcp = distribute_vector(xc, NP, Pg.n_local_col)
    mesh = make_mesh(NP)
    fn = jax.shard_map(
        lambda Ash, xs: shard_spmv(Ash, xs[0], "p")[None],
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("p"), Pg), P("p")),
        out_specs=P("p"),
    )
    y = np.asarray(gather_vector(fn(Pg, xcp), Pg.n_global))
    np.testing.assert_allclose(y, np.asarray(rt.spmv(Pm, xc)), rtol=1e-10)


def test_dist_wjd_interior_spmv(problem, rng):
    """Stacked per-part WJD interior apply inside shard_map matches the
    XLA segment-sum path (reference: the same optimized csrmv serves every
    rank's interior, global_matrix.cpp:976-1007)."""
    from jax.sharding import PartitionSpec as P

    A, b, _ = problem
    Ag = distribute_csr(A, NP, wjd=True)
    assert Ag.int_wjd is not None
    x = rng.standard_normal(A.shape[0])
    xp = distribute_vector(x, NP, Ag.n_local)
    mesh = make_mesh(NP)
    fn = jax.shard_map(
        lambda Ash, xs: shard_spmv(Ash, xs[0], "p")[None],
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("p"), Ag), P("p")),
        out_specs=P("p"),
        check_vma=False,      # pallas out_shapes carry no vma info
    )
    y = np.asarray(gather_vector(fn(Ag, xp), Ag.n_global))
    np.testing.assert_allclose(y, np.asarray(rt.spmv(A, x)), rtol=1e-12)


def test_dist_wjd_cg_f32(problem):
    """Distributed CG with the f32 WJD interior kernel converges with
    iteration parity vs the XLA path."""
    A, b, x_true = problem
    A32 = rt.convert(A, "CSR")
    d, i, p = A32.numpy_triplet()
    A32 = rt.CSR.from_arrays(d.astype(np.float32), i, p, A32.shape)
    b32 = b.astype(np.float32)
    Ag_w = distribute_csr(A32, NP, wjd=True)
    Ag_x = distribute_csr(A32, NP, wjd=False)
    xw, iw = dist_solve(cg, Ag_w, b32, rel_tol=1e-5, max_iter=500)
    xx, ix = dist_solve(cg, Ag_x, b32, rel_tol=1e-5, max_iter=500)
    assert int(iw.status) in (1, 2)
    assert abs(int(iw.iterations) - int(ix.iterations)) <= 2
    assert np.linalg.norm(np.asarray(xw) - x_true) < 1e-2


@pytest.mark.parametrize("kind,solver_name", [
    ("spai", "cg"), ("fsai", "cg"), ("ilu0", "fgmres"), ("ilut", "fgmres"),
])
def test_block_jacobi_local_precond(kind, solver_name):
    """BlockJacobi with a LOCAL sub-preconditioner per diagonal block
    (reference: preconditioner_blockjacobi.hpp, as used by fgmres_mpi/
    idr_mpi/fcg_mpi/qmrcgstab_mpi): converges and beats no-precond."""
    from rocalution_tpu.parallel import (block_jacobi_precond, dist_solve,
                                         distribute_csr, make_mesh)

    A = rt.laplacian_2d(32)
    b = np.asarray(rt.spmv(A, np.ones(A.shape[0])))
    Ag = distribute_csr(A, 8)
    mesh = make_mesh(8)
    solver = getattr(rt, solver_name)
    _, i0 = dist_solve(solver, Ag, b, mesh=mesh, rel_tol=1e-8, max_iter=2000)
    M = block_jacobi_precond(Ag, kind)
    x, info = dist_solve(solver, Ag, b, M=M, mesh=mesh, rel_tol=1e-8,
                         max_iter=2000)
    err = np.linalg.norm(np.asarray(x) - 1.0)
    assert err < 1e-5, (kind, err)
    assert int(info.iterations) <= int(i0.iterations), (kind,)
