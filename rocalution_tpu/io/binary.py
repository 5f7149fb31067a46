"""Binary sparse-matrix / vector container.

Reference parity: the rocsparseio versioned binary container
(src/utils/rocsparseio.{h,hpp,cpp} — format enums rocsparseio.h:66-100,
WriteFileCSR/ReadFileCSR on LocalMatrix, vector binary IO on LocalVector)
and the multi-rank file layout of docs/api-reference/multinode.rst:126-155.

TPU-native implementation: a small self-describing npz-based container
(magic + version + format tag + index/value arrays) — same capability
(versioned, typed, per-rank shardable), numpy-native speed.
"""

from __future__ import annotations

import numpy as np

from ..formats import CSR
from ..formats.base import get_host

MAGIC = "rocalution_tpu_bin"
VERSION = 1


def write_csr(path: str, A: CSR) -> None:
    """Write a CSR matrix (reference: LocalMatrix::WriteFileCSR /
    rocsparseio container)."""
    data = get_host(A, "data")
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        magic=MAGIC, version=VERSION, fmt="csr",
        nrow=A.shape[0], ncol=A.shape[1],
        data=data,
        indices=get_host(A, "indices").astype(np.int32),
        indptr=get_host(A, "indptr").astype(np.int64),
    )


def read_csr(path: str) -> CSR:
    """Read a CSR matrix (reference: LocalMatrix::ReadFileCSR)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    if str(z["magic"]) != MAGIC:
        raise ValueError(f"{path}: not a rocalution_tpu binary file")
    if str(z["fmt"]) != "csr":
        raise ValueError(f"{path}: unsupported format {z['fmt']!r}")
    return CSR.from_arrays(
        z["data"], z["indices"], z["indptr"],
        (int(z["nrow"]), int(z["ncol"])),
    )


def write_vector(path: str, v, binary: bool = True) -> None:
    """Vector IO (reference: LocalVector::WriteFile{ASCII,Binary})."""
    v = np.asarray(v)
    if binary:
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 magic=MAGIC, version=VERSION, fmt="vec", data=v)
    else:
        np.savetxt(path, v)


def read_vector(path: str, binary: bool = True) -> np.ndarray:
    if binary:
        if not path.endswith(".npz"):
            path = path + ".npz"
        z = np.load(path, allow_pickle=False)
        if str(z["magic"]) != MAGIC or str(z["fmt"]) != "vec":
            raise ValueError(f"{path}: not a rocalution_tpu vector file")
        return z["data"]
    return np.loadtxt(path)


def write_global_csr(prefix: str, Ag, pm=None) -> None:
    """Per-rank distributed matrix layout (reference: the
    `matrix.mtx.interior.rank.N` / `parallelmanager.dat.rank.N` triad,
    docs/api-reference/multinode.rst:126-155): one interior file per
    partition plus a partition descriptor."""
    import json

    P = Ag.nparts
    meta = {
        "magic": MAGIC, "version": VERSION, "nparts": P,
        "n_global": int(Ag.n_global), "n_local": int(Ag.n_local),
    }
    with open(f"{prefix}.pm.json", "w") as f:
        json.dump(meta, f)
    rows = np.asarray(Ag.int_rows)
    cols = np.asarray(Ag.int_cols)
    data = np.asarray(Ag.int_data)
    for p in range(P):
        np.savez(f"{prefix}.interior.rank.{p}.npz",
                 magic=MAGIC, version=VERSION, fmt="coo-shard",
                 rows=rows[p], cols=cols[p], data=data[p])
