"""Benchmark harness (reference methodology: clients/samples/benchmark.cpp).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
Per-op details go to stderr.

Measurement protocol (shaped by measured platform behavior):
* all matrices are constructed HOST-SIDE and uploaded once — a device->host
  transfer switches this TPU tunnel into a ~7 ms/op synchronous mode, so no
  device readback happens until every timing is done;
* every jitted op takes its operands as arguments (closed-over device arrays
  are re-materialized per call on this platform);
* timings are min-of-trials over pipelined dispatch batches, after warmup.

Headline metric: CSR SpMV bandwidth (GB/s, f32) on a 3D Laplacian, using the
reference's byte model `(sizeof(T)+sizeof(int)) * nnz` (benchmark.cpp:210-380).
Baseline: 80% of the detected chip's HBM roofline (BASELINE.md target).
"""

import json
import sys
import time

import numpy as np


def hbm_gbps(kind: str) -> float:
    kind = kind.lower()
    table = {
        "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0,
        "v4": 1228.0, "v6": 1640.0, "trillium": 1640.0,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import rocalution_tpu as rt
    from rocalution_tpu.ops.spmv import spmv

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    dev = jax.devices()[0]
    log("device:", dev.device_kind, "backend:", jax.default_backend())
    roof = hbm_gbps(dev.device_kind)

    dtype = np.float32
    isize = 4
    vsize = np.dtype(dtype).itemsize

    n = 100  # 1e6 rows, ~6.94M nnz
    A = rt.laplacian_3d(n, dtype=dtype)
    nnz = A.nnz
    N = A.shape[0]
    log(f"matrix: laplacian_3d({n})  N={N}  nnz={nnz}  dtype={np.dtype(dtype).name}")

    mats = {"csr": A}
    for fmt in ("ELL", "DIA", "HYB", "BCSR"):
        mats[fmt.lower()] = rt.convert(A, fmt)
    log("formats converted (host-side)")

    x = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(dtype)
    )
    y = jax.device_put(
        np.random.default_rng(1).standard_normal(N).astype(dtype)
    )

    def timeit(fn, *args, reps=50, trials=3, warmup=2):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    results = {}

    # BLAS-1 (reference formulas, benchmark.cpp:104-206)
    dt = timeit(jax.jit(rt.blas1.dot), x, y)
    results["dot_gbps"] = 2 * N * vsize / dt / 1e9
    dt = timeit(jax.jit(rt.blas1.norm), x)
    results["norm_gbps"] = 2 * N * vsize / dt / 1e9
    dt = timeit(jax.jit(lambda a, b: a + 2.0 * b), x, y)
    results["axpy_gbps"] = 3 * N * vsize / dt / 1e9
    dt = timeit(jax.jit(rt.blas1.reduce_sum), x)
    results["reduce_gbps"] = N * vsize / dt / 1e9

    # SpMV per format (bytes = (vsize+isize)*nnz, reference formula)
    spmv_bytes = (vsize + isize) * nnz
    jspmv = jax.jit(spmv)
    for name, B in mats.items():
        dt = timeit(jspmv, B, x, reps=30)
        results[f"spmv_{name}_gbps"] = spmv_bytes / dt / 1e9
        results[f"spmv_{name}_gflops"] = 2 * nnz / dt / 1e9

    # End-to-end solver timing: CG+Jacobi on 2D Laplacian (the reference's
    # canonical smoke benchmark scale class, README.md:66-73)
    A2 = rt.laplacian_2d(256, dtype=dtype)   # 65536 unknowns
    b2 = np.asarray(
        # host-side b = A*1 (no device readback): row sums
        np.add.reduceat(
            A2.numpy_triplet()[0],
            A2.numpy_triplet()[2][:-1].astype(np.int64),
        )
    ).astype(dtype)
    b2d = jax.device_put(b2)
    inv_diag = jax.device_put(
        (1.0 / np.add.reduceat(
            np.where(
                A2.numpy_triplet()[1] == A2.numpy_rows(), A2.numpy_triplet()[0], 0
            ),
            A2.numpy_triplet()[2][:-1].astype(np.int64),
        )).astype(dtype)
    )

    def solve(A, b, inv_diag):
        xs, info = rt.cg(A, b, M=lambda r: inv_diag * r,
                         rel_tol=1e-6, max_iter=1000)
        return xs, info.iterations, info.final_res

    jsolve = jax.jit(solve)
    dt = timeit(jsolve, A2, b2d, inv_diag, reps=3, trials=3, warmup=1)
    results["cg_jacobi_65k_ms"] = dt * 1e3

    # ---- timings done; device readback is now safe ----
    xs, iters, res = jsolve(A2, b2d, inv_diag)
    results["cg_jacobi_65k_iters"] = int(iters)
    log(f"cg check: iters={int(iters)} final_res={float(res):.3e}")

    for k, v in sorted(results.items()):
        log(f"  {k:26s} {v:12.2f}")

    value = results.get("spmv_csr_gbps", 0.0)
    baseline = 0.8 * roof
    print(json.dumps({
        "metric": "spmv_csr_f32_bandwidth",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / baseline, 4),
        "detail": {k: round(v, 3) for k, v in results.items()},
        "roofline_gbps": roof,
    }))


if __name__ == "__main__":
    main()
