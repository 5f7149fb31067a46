#!/usr/bin/env python3
"""One-shot TPU validation + calibration drive (run when hardware is up).

Covers, in priority order (each stage prints PASS/numbers and flushes so a
timeout still leaves evidence):
 1. correctness of every WJD kernel variant ON HARDWARE (gather / roll /
    float-float f64 / complex / multi-RHS) vs the XLA reference;
 2. kernel-mode calibration numbers (forced gather vs roll on the 1M-row
    3D Laplacian) for the conversion cost model;
 3. an end-to-end CG solve through the public API (the verify recipe);
 4. a jax.profiler trace of a solve for the overlap analysis.
"""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    import rocalution_tpu as rt
    from rocalution_tpu.formats.wjd import from_csr
    from rocalution_tpu.ops.spmv import attach_wjd, spmv

    log("device:", jax.devices()[0].device_kind, jax.default_backend())

    rng = np.random.default_rng(0)

    # --- 1. hardware correctness ---------------------------------------
    def to_device(x):
        """device_put of a complex numpy buffer is UNIMPLEMENTED on the
        axon relay — upload real/imag planes and combine on device."""
        if np.iscomplexobj(x):
            return jax.lax.complex(jnp.asarray(np.ascontiguousarray(x.real)),
                                   jnp.asarray(np.ascontiguousarray(x.imag)))
        return jnp.asarray(x)

    def check(name, W, A_scipy, x, tol):
        y = spmv(W, to_device(x))
        if jnp.iscomplexobj(y):   # d2h of complex may be unimplemented too
            got = np.asarray(jnp.real(y)) + 1j * np.asarray(jnp.imag(y))
        else:
            got = np.asarray(y)
        ref = A_scipy @ x
        rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-300)
        status = "PASS" if rel < tol else "FAIL"
        log(f"  [{status}] {name}: rel={rel:.2e} (tol {tol:.0e})")
        return rel < tol

    import scipy.sparse as sp

    ok = True
    A = rt.laplacian_2d(64, dtype=np.float32)
    d, i, p = A.numpy_triplet()
    S = sp.csr_matrix((d, i, p), shape=A.shape)
    x = rng.standard_normal(A.shape[0]).astype(np.float32)
    Wr = from_csr(A, kernel_mode="roll")
    assert Wr.kernel_mode == "roll"
    ok &= check("roll f32", Wr, S, x, 2e-5)
    Wg = from_csr(A, kernel_mode="gather")
    ok &= check("gather f32", Wg, S, x, 2e-5)

    Ar = rt.random_banded_spd(50_000, dtype=np.float32)
    dr, ir, pr = Ar.numpy_triplet()
    Sr = sp.csr_matrix((dr, ir, pr), shape=Ar.shape)
    xr = rng.standard_normal(Ar.shape[0]).astype(np.float32)
    ok &= check("gather f32 rand", from_csr(Ar), Sr, xr, 2e-4)

    A64 = rt.laplacian_2d(64, dtype=np.float64)
    d64, i64, p64 = A64.numpy_triplet()
    d64 = d64 * (1 + 1e-9 * rng.standard_normal(len(d64)))
    A64 = rt.CSR.from_arrays(d64, i64, p64, A64.shape)
    S64 = sp.csr_matrix((d64, i64, p64), shape=A64.shape)
    x64 = rng.standard_normal(A64.shape[0])
    ok &= check("roll ff f64", from_csr(A64), S64, x64, 1e-12)
    ok &= check("gather ff f64", from_csr(A64, kernel_mode="gather"),
                S64, x64, 1e-12)

    X = rng.standard_normal((A.shape[0], 4)).astype(np.float32)
    gotM = np.asarray(spmv(Wg, jnp.asarray(X)))
    relM = np.linalg.norm(gotM - S @ X) / np.linalg.norm(S @ X)
    log(f"  [{'PASS' if relM < 2e-5 else 'FAIL'}] mrhs f32: rel={relM:.2e}")
    ok &= relM < 2e-5
    print(f"STAGE1 {'PASS' if ok else 'FAIL'}", flush=True)

    # --- 2. calibration on the 1M-row Laplacian ------------------------
    def chain_time(step, x0, budget_s=0.15, probe=20):
        @jax.jit
        def run(v, k):
            return jnp.sum(jax.lax.fori_loop(0, k, lambda _, c: step(c), v))

        def timed(k):
            t0 = time.perf_counter()
            float(run(x0, k))
            return time.perf_counter() - t0

        float(run(x0, 2))
        est = max((timed(probe) - timed(2)) / (probe - 2), 1e-9)
        K = int(max(2, min(20000, budget_s / est)))
        timed(K); timed(2 * K)
        return max((timed(2 * K) - timed(K)) / K, 1e-12)

    AL = rt.laplacian_3d(100, dtype=np.float32)
    nnz = AL.nnz
    xb = (rng.standard_normal(AL.shape[0]) / 1e6).astype(np.float32)
    xd = jax.device_put(xb)
    scale = np.float32(1 / 12.0)
    for mode in ("roll", "gather"):
        W = from_csr(AL, kernel_mode=mode)
        t = chain_time(lambda c, W=W: spmv(W, c) * scale, xd)
        Tp, K = W.brow.shape
        log(f"  calib {mode}: {t*1e6:.1f} us/op = "
            f"{(8*nnz)/t/1e9:.0f} GB/s (ref model), "
            f"{t*1e9/(Tp*K):.1f} ns/slot")
        print(f"CALIB {mode} {t*1e6:.2f} us", flush=True)
    # f64 ff on a 262k matrix
    A3 = rt.laplacian_3d(64, dtype=np.float64)
    attach_wjd(A3)
    x3 = jax.device_put(rng.standard_normal(A3.shape[0]) / 262144)
    t = chain_time(lambda c: spmv(A3, c) * np.float64(1 / 12), x3)
    log(f"  calib ff: {t*1e6:.1f} us/op = {(12*A3.nnz)/t/1e9:.0f} GB/s")
    print(f"CALIB ff {t*1e6:.2f} us", flush=True)

    # --- 3. end-to-end solve (verify recipe) ---------------------------
    Av = rt.laplacian_2d(64)
    bv = np.asarray(rt.spmv(Av, np.ones(Av.shape[0])))
    xv, info = rt.cg(Av, bv, M=rt.jacobi(Av), rel_tol=1e-10, max_iter=1000)
    err = float(np.linalg.norm(np.asarray(xv) - 1.0))
    assert int(info.status) in (1, 2) and err < 1e-6, (info, err)
    print(f"STAGE3 PASS cg iters={int(info.iterations)} err={err:.1e}",
          flush=True)

    # --- 4. profiler trace (before the sharded stage: its shard_map
    # compile is the slowest single step on this tunnel and must not
    # starve the trace artifact under a driver timeout) ------------------
    from rocalution_tpu.utils.profile import latest_trace_file, profile

    with profile("/tmp/rt_trace_tpu"):
        xs, _ = rt.cg(Av, bv, M=rt.jacobi(Av), rel_tol=1e-10, max_iter=1000)
        np.asarray(xs)
    print("TRACE", latest_trace_file("/tmp/rt_trace_tpu"), flush=True)

    # --- 4b. sharded path on hardware (1-part mesh, WJD interior) -------
    from rocalution_tpu.parallel import (block_jacobi_diag, dist_solve,
                                         distribute_csr, make_mesh)

    Ag = distribute_csr(Av, 1, wjd=True)
    xs1, info1 = dist_solve(rt.cg, Ag, bv, M=block_jacobi_diag(Ag),
                            mesh=make_mesh(1), rel_tol=1e-10, max_iter=1000)
    err1 = float(np.linalg.norm(np.asarray(xs1) - 1.0))
    assert int(info1.status) in (1, 2) and err1 < 1e-6, (info1, err1)
    print(f"STAGE4b PASS shard_map cg iters={int(info1.iterations)} "
          f"err={err1:.1e}", flush=True)

    # --- 5. complex plane kernels — LAST: a platform that lacks complex
    # (the axon relay reports UNIMPLEMENTED for any complex-dtype op, and
    # the failure poisons the tunnel session for every later transfer)
    # must not take down the stages above. Real TPU runtimes lower
    # complex64 to f32 pairs and run the same ComplexWJD planes.
    dc = (d + 1j * rng.standard_normal(len(d))).astype(np.complex64)
    Ac = rt.CSR.from_arrays(dc, i, p, A.shape)
    Sc = sp.csr_matrix((dc, i, p), shape=A.shape)
    xc = (rng.standard_normal(A.shape[0])
          + 1j * rng.standard_normal(A.shape[0])).astype(np.complex64)
    try:
        okc = check("complex64", from_csr(Ac), Sc, xc, 2e-4)
        print(f"STAGE5 {'PASS' if okc else 'FAIL'}", flush=True)
    except Exception as e:   # axon relay: complex dtype ops UNIMPLEMENTED
        log(f"  [SKIP] complex64: platform does not implement complex "
            f"({type(e).__name__}) — covered by the CPU suite")
        print("STAGE5 SKIP (no complex on this platform)", flush=True)


if __name__ == "__main__":
    main()
