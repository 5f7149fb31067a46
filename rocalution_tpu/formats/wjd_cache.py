"""On-disk WJD plan cache — pay the csrmv-analysis cost once per machine.

The reference's csrmv analysis (hip_sparse.hpp csrmv_analysis behind
HIPAcceleratorMatrixCSR::Apply) is a milliseconds-scale device pass that is
re-run every process start. Our analysis is a host numpy planning pass
(seconds at millions of rows), so we persist the finished plan — the slot
value/offset vregs plus the static layout — keyed by a content hash of the
CSR triplet and the conversion options. A later process (or the benchmark
driver on a cold run) reconstructs the WJD from one uncompressed ``.npz``
read instead of re-planning.

The cache stores HOST numpy arrays only: it is written before any device
array exists, so no device→host read ever happens on this path (d2h poisons
the tunnel's async dispatch — see formats/base.py host caches).

Env knobs: ``ROCALUTION_TPU_PLAN_CACHE=0`` disables; any other value is the
cache directory (default ``~/.cache/rocalution_tpu/wjd_plans``).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Optional

import numpy as np

# bump when the plan layout / WJD field semantics change
# (v2: roll-kernel 16-row loads need 8 more rows of x padding;
#  v3: per-step win_base/win_rows for the HBM-x roll variant;
#  v4: windowed-regime group sizing;
#  v5: gather-mode windows + unified win_rows formula;
#  v6: plans carry the real-slot mask so stack_wjd can re-derive windows;
#  v7: hybrid DIA-split fields dia_data/dia_offsets)
PLAN_VERSION = 7

_ARRAY_FIELDS = ("data", "data_lo", "uloc", "brow", "diag_u", "win_base",
                 "real", "dia_data", "spill_row", "spill_col", "spill_val")
_STATIC_FIELDS = ("shape", "pad_lo", "xp_len", "nnz", "group", "wlog",
                  "win_rows", "value_dtype", "kernel_mode", "dia_offsets")


def cache_dir() -> Optional[str]:
    env = os.environ.get("ROCALUTION_TPU_PLAN_CACHE")
    if env == "0":
        return None
    if env:
        return env
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "rocalution_tpu", "wjd_plans")


def plan_key(vals: np.ndarray, cols: np.ndarray, indptr: np.ndarray,
             shape, opts: dict) -> str:
    """Content hash of (triplet, shape, conversion options, version).

    Mirrors LocalMatrix::Key()'s structure/pattern/value components
    (reference: src/base/local_matrix.cpp Key) collapsed into one digest."""
    h = hashlib.sha256()
    h.update(f"wjd-plan-v{PLAN_VERSION}".encode())
    h.update(json.dumps(sorted((k, str(v)) for k, v in opts.items()))
             .encode())
    h.update(np.asarray(shape, np.int64).tobytes())
    h.update(str(np.asarray(vals).dtype).encode())
    h.update(np.ascontiguousarray(vals).view(np.uint8).tobytes())
    h.update(np.ascontiguousarray(cols, dtype=np.int64).tobytes())
    h.update(np.ascontiguousarray(indptr, dtype=np.int64).tobytes())
    return h.hexdigest()[:32]


def _np_view(a: np.ndarray) -> tuple:
    """(storable array, dtype name) — bfloat16 is stored as its uint16 bits
    (numpy can't round-trip ml_dtypes through .npz natively)."""
    name = a.dtype.name if hasattr(a.dtype, "name") else str(a.dtype)
    if name == "bfloat16":
        return a.view(np.uint16), "bfloat16"
    return a, name


def _np_restore(a: np.ndarray, name: str) -> np.ndarray:
    if name == "bfloat16":
        import ml_dtypes

        return a.view(ml_dtypes.bfloat16)
    return a


def load_plan(key: str) -> Optional[dict]:
    d = cache_dir()
    if d is None:
        return None
    path = os.path.join(d, key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if meta.get("version") != PLAN_VERSION:
                return None
            plan = dict(meta["statics"])
            plan["shape"] = tuple(plan["shape"])
            plan["dia_offsets"] = tuple(plan.get("dia_offsets") or ())
            for f in _ARRAY_FIELDS:
                if f in meta["dtypes"]:
                    plan[f] = _np_restore(z[f], meta["dtypes"][f])
                else:
                    plan[f] = None
            return plan
    except Exception:
        return None          # corrupt/partial file: replan


# total-directory budget: oldest entries are evicted past this (the cache
# is a per-machine optimization, not an archive); single plans above the
# per-entry cap are not persisted at all (a multi-GB write costs more than
# the replan it saves)
_DIR_BUDGET_BYTES = int(os.environ.get("ROCALUTION_TPU_PLAN_CACHE_BYTES",
                                       16 << 30))
_MAX_ENTRY_BYTES = 4 << 30


def _evict(d: str, incoming: int) -> None:
    try:
        entries = []
        total = incoming
        for f in os.listdir(d):
            if not f.endswith(".npz"):
                continue
            p = os.path.join(d, f)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        entries.sort()
        for _, sz, p in entries:
            if total <= _DIR_BUDGET_BYTES:
                break
            os.unlink(p)
            total -= sz
    except Exception:
        pass


def save_plan(key: str, plan: dict) -> None:
    d = cache_dir()
    if d is None:
        return
    size_est = sum(np.asarray(plan[f]).nbytes for f in _ARRAY_FIELDS
                   if plan.get(f) is not None)
    if size_est > _MAX_ENTRY_BYTES:
        return
    try:
        os.makedirs(d, exist_ok=True)
        _evict(d, size_est)
        arrays, dtypes = {}, {}
        for f in _ARRAY_FIELDS:
            a = plan.get(f)
            if a is None:
                continue
            arrays[f], dtypes[f] = _np_view(np.asarray(a))
        meta = json.dumps({
            "version": PLAN_VERSION,
            "dtypes": dtypes,
            "statics": {k: plan[k] for k in _STATIC_FIELDS},
        }).encode()
        arrays["meta"] = np.frombuffer(meta, dtype=np.uint8)
        # atomic publish: a concurrent reader must never see a partial file
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                np.savez(fh, **arrays)
            os.replace(tmp, path := os.path.join(d, key + ".npz"))
            del path
        except BaseException:
            os.unlink(tmp)
            raise
    except Exception:
        pass                 # cache is an optimization — never fail setup
