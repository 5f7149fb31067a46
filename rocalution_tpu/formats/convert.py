"""Format conversions (reference: src/base/host/host_conversion.cpp — any↔CSR↔any).

Conversions are setup-phase operations (like the reference's `ConvertTo`,
local_matrix.cpp) and run host-side with numpy; the resulting format pytree
lives on device. CSR is the hub format.
"""

from __future__ import annotations

import numpy as np

from .base import get_host
from .bcsr import BCSR
from .coo import COO
from .csr import CSR
from .dense import DENSE
from .dia import DIA
from .ell import ELL
from .hyb import HYB
from .mcsr import MCSR
from .wjd import WJD, from_csr as _wjd_from_csr

FORMATS = {
    "CSR": CSR,
    "COO": COO,
    "ELL": ELL,
    "DIA": DIA,
    "HYB": HYB,
    "BCSR": BCSR,
    "MCSR": MCSR,
    "DENSE": DENSE,
    "WJD": WJD,
}


def to_csr(mat) -> CSR:
    """Convert any format to CSR (host-side)."""
    if isinstance(mat, CSR):
        return mat
    if isinstance(mat, COO):
        return CSR.from_coo(
            get_host(mat, "row"), get_host(mat, "col"), get_host(mat, "data"),
            mat.shape,
        )
    if isinstance(mat, ELL):
        ind = get_host(mat, "indices")
        dat = get_host(mat, "data")
        rows = np.broadcast_to(
            np.arange(mat.shape[0])[:, None], ind.shape
        )
        mask = ind >= 0
        return CSR.from_coo(rows[mask], ind[mask], dat[mask], mat.shape)
    if isinstance(mat, DIA):
        dat = get_host(mat, "data")
        n, m = mat.shape
        rows_all, cols_all, vals_all = [], [], []
        for d, off in enumerate(mat.offsets):
            rows = np.arange(max(0, -off), min(n, m - off))
            cols = rows + off
            vals = dat[d, rows]
            keep = vals != 0
            rows_all.append(rows[keep])
            cols_all.append(cols[keep])
            vals_all.append(vals[keep])
        if rows_all:
            return CSR.from_coo(
                np.concatenate(rows_all),
                np.concatenate(cols_all),
                np.concatenate(vals_all),
                mat.shape,
            )
        return CSR.from_coo([], [], [], mat.shape)
    if isinstance(mat, HYB):
        a = to_csr(mat.ell)
        b = to_csr(mat.coo)
        ra = a.numpy_rows(); ca = get_host(a, "indices"); va = get_host(a, "data")
        rb = b.numpy_rows(); cb = get_host(b, "indices"); vb = get_host(b, "data")
        return CSR.from_coo(
            np.concatenate([ra, rb]),
            np.concatenate([ca, cb]),
            np.concatenate([va, vb]),
            mat.shape,
        )
    if isinstance(mat, BCSR):
        blocks = get_host(mat, "data")       # (nnzb, bd, bd)
        brow = get_host(mat, "row_ids")
        bcol = get_host(mat, "indices")
        bd = mat.block_dim
        nb, _, _ = blocks.shape
        br, bc = np.nonzero(np.ones((bd, bd), dtype=bool))
        rows = (brow[:, None] * bd + br[None, :]).reshape(-1)
        cols = (bcol[:, None] * bd + bc[None, :]).reshape(-1)
        vals = blocks.reshape(nb, -1).reshape(-1)
        keep = (vals != 0) & (rows < mat.shape[0]) & (cols < mat.shape[1])
        return CSR.from_coo(rows[keep], cols[keep], vals[keep], mat.shape)
    if isinstance(mat, MCSR):
        o = mat.offd
        rows = o.numpy_rows(); cols = get_host(o, "indices")
        vals = get_host(o, "data")
        n = min(mat.shape)
        drows = np.arange(n)
        diag = get_host(mat, "diag")[:n]
        keep = diag != 0
        return CSR.from_coo(
            np.concatenate([rows, drows[keep]]),
            np.concatenate([cols, drows[keep]]),
            np.concatenate([vals, diag[keep]]),
            mat.shape,
        )
    if isinstance(mat, DENSE):
        return CSR.from_dense(get_host(mat, "data"))
    from .wjd import ComplexWJD

    if isinstance(mat, ComplexWJD):
        re = to_csr(mat.re)
        im = to_csr(mat.im)
        rr, rc, rv = re.numpy_rows(), get_host(re, "indices"), get_host(re, "data")
        ir, icx, iv = im.numpy_rows(), get_host(im, "indices"), get_host(im, "data")
        return CSR.from_coo(
            np.concatenate([rr, ir]), np.concatenate([rc, icx]),
            np.concatenate([rv.astype(np.dtype(mat.value_dtype)),
                            1j * iv.astype(np.dtype(mat.value_dtype))]),
            mat.re.shape,
        )
    if isinstance(mat, WJD):
        # reconstruct COO from slot vregs (explicit zeros are dropped, like
        # every padded-format round trip: ELL/DIA do the same)
        val = get_host(mat, "data")
        if mat.data_lo is not None:   # float-float: v = hi + lo exactly
            val = val.astype(np.float64) + get_host(mat, "data_lo")
        if getattr(mat, "uloc", None) is None:           # roll mode
            du = np.maximum(np.asarray(get_host(mat, "diag_u")), 0)
            u = np.broadcast_to(
                du[:, :, None, None].astype(np.int64),
                du.shape + (8, 128))
        else:
            u = get_host(mat, "uloc").astype(np.int64)
        brow = get_host(mat, "brow").astype(np.int64)
        Tp, K = brow.shape
        tt, kk, ss, ll = np.nonzero(val)
        rows = tt * 1024 + ss * 128 + ll
        cols = (brow[tt, kk] * 128 - mat.pad_lo) + ss * 128 + ll + u[tt, kk, ss, ll]
        vals = val[tt, kk, ss, ll]
        sr = get_host(mat, "spill_row")
        sc = get_host(mat, "spill_col")
        sv = get_host(mat, "spill_val")
        return CSR.from_coo(
            np.concatenate([rows, sr]), np.concatenate([cols, sc]),
            np.concatenate([vals, sv]), mat.shape,
        )
    raise TypeError(f"cannot convert {type(mat).__name__} to CSR")


def cast_values(mat, dtype, device: bool = True):
    """Cast a format's value arrays to `dtype`, host-side when caches exist
    (setup-phase: each eager device cast costs a remote compile on this
    platform). ``device=False`` keeps the result host-resident (see
    CSR.from_arrays) — for hierarchy levels that will be served through an
    attached WJD fast-apply rather than their own CSR arrays."""
    import jax
    import jax.numpy as jnp

    if isinstance(mat, CSR) and getattr(mat, "_host_cache", None):
        d, i, p = mat.numpy_triplet()
        return CSR.from_arrays(d.astype(dtype), i, p, mat.shape,
                               device=device)
    if isinstance(mat, DIA):
        from .base import set_host_cache

        dat = get_host(mat, "data").astype(dtype)
        out = DIA(data=jnp.asarray(dat), offsets=mat.offsets, shape=mat.shape)
        set_host_cache(out, data=dat)
        return out
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact)
        else x,
        mat,
    )


def convert(mat, fmt: str, **kwargs):
    """Convert a matrix to the named format (analog LocalMatrix::ConvertTo)."""
    fmt = fmt.upper()
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; options: {sorted(FORMATS)}")
    if type(mat).__name__ == fmt:
        return mat
    csr = to_csr(mat)
    if fmt == "CSR":
        return csr
    if fmt == "COO":
        return COO.from_arrays(csr.row_ids, csr.indices, csr.data, csr.shape)
    if fmt == "ELL":
        return ELL.from_csr_host(csr, **kwargs)
    if fmt == "DIA":
        return DIA.from_csr_host(csr)
    if fmt == "HYB":
        return HYB.from_csr_host(csr, **kwargs)
    if fmt == "BCSR":
        return BCSR.from_csr_host(csr, kwargs.get("block_dim", 4))
    if fmt == "MCSR":
        return MCSR.from_csr_host(csr)
    if fmt == "WJD":
        return _wjd_from_csr(csr, **kwargs)
    if fmt == "DENSE":
        return DENSE.from_csr_host(csr)
    raise AssertionError
