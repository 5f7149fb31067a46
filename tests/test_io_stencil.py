"""Stencil operator and IO round-trip tests (reference: local_stencil tests,
host_io MTX/binary round trips, multinode file layout)."""

import numpy as np
import pytest

import rocalution_tpu as rt
from rocalution_tpu.io import (read_csr, read_mtx, read_vector, write_csr,
                               write_global_csr, write_mtx, write_vector)


def test_stencil_matches_matrix(rng):
    st = rt.laplace2d_stencil(12)
    A = rt.laplacian_2d(12)
    x = rng.standard_normal(144)
    np.testing.assert_allclose(
        np.asarray(rt.spmv(st, x)), np.asarray(rt.spmv(A, x)), atol=1e-12
    )


def test_stencil_to_csr(rng):
    st = rt.laplace3d_stencil(5)
    A = st.to_csr()
    x = rng.standard_normal(125)
    np.testing.assert_allclose(
        np.asarray(rt.spmv(st, x)), np.asarray(rt.spmv(A, x)), atol=1e-12
    )


def test_stencil_cg(rng):
    st = rt.laplace2d_stencil(10)
    ones = np.ones(100)
    b = np.asarray(rt.spmv(st, ones))
    x, info = rt.cg(st, b, rel_tol=1e-10)
    assert bool(info.converged)
    assert np.linalg.norm(np.asarray(x) - ones) < 1e-6


def test_mtx_roundtrip(tmp_path, rng):
    A = rt.utils.generators.random_spd(30, density=0.1, seed=4)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, A)
    B = read_mtx(p)
    np.testing.assert_allclose(
        np.asarray(A.to_dense()), np.asarray(B.to_dense()), rtol=1e-12
    )


def test_binary_roundtrip(tmp_path):
    A = rt.laplacian_2d(9)
    p = str(tmp_path / "m")
    write_csr(p, A)
    B = read_csr(p)
    np.testing.assert_allclose(
        np.asarray(A.to_dense()), np.asarray(B.to_dense()), atol=0
    )


def test_vector_io(tmp_path, rng):
    v = rng.standard_normal(64)
    pb = str(tmp_path / "v")
    write_vector(pb, v)
    np.testing.assert_allclose(read_vector(pb), v, atol=0)
    pa = str(tmp_path / "v.txt")
    write_vector(pa, v, binary=False)
    np.testing.assert_allclose(read_vector(pa, binary=False), v, rtol=1e-12)


def test_global_layout(tmp_path):
    from rocalution_tpu.parallel import distribute_csr

    A = rt.laplacian_2d(8)
    Ag = distribute_csr(A, 4)
    prefix = str(tmp_path / "dist")
    write_global_csr(prefix, Ag)
    import json
    import os

    meta = json.load(open(prefix + ".pm.json"))
    assert meta["nparts"] == 4
    for p in range(4):
        assert os.path.exists(f"{prefix}.interior.rank.{p}.npz")
