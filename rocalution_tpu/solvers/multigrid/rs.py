"""Classical Ruge-Stüben AMG.

Reference parity: RugeStuebenAMG (ruge_stueben_amg.{hpp,cpp}) —
SetStrengthThreshold (default 0.25), SetCoarseningStrategy (Greedy | PMIS),
SetInterpolationType (Direct | ExtPI) (ruge_stueben_amg.hpp:63-75); host
kernels RSCoarsening/RSPMISCoarsening/RSDirect/ExtPIInterpolation
(host_matrix_csr.cpp), device PMIS kernels (hip_rsamg_csr.cpp — random-hash
Luby rounds, the same parallel family used here).

Setup is host-side vectorized numpy (Luby rounds, vectorized direct
interpolation); the hierarchy is static-shape device data.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ...formats import CSR
from ...formats.base import get_host


def _scipy(A: CSR):
    import scipy.sparse as sp

    return sp.csr_matrix(
        (get_host(A, "data"), get_host(A, "indices").astype(np.int64),
         get_host(A, "indptr").astype(np.int64)), shape=A.shape,
    )


def classical_strength(S, theta: float = 0.25):
    """Classical strength-of-connection: i strongly depends on j if
    -a_ij >= theta * max_k(-a_ik) (reference: RS strength computation)."""
    import scipy.sparse as sp

    n = S.shape[0]
    C = S.tocoo()
    offd = C.row != C.col
    neg = np.where(offd, -C.data, -np.inf)
    # per-row max of -a_ik over off-diagonals
    row_max = np.full(n, 0.0)
    np.maximum.at(row_max, C.row, np.where(offd, neg, 0.0))
    keep = offd & (neg >= theta * row_max[C.row]) & (neg > 0)
    return sp.csr_matrix(
        (np.ones(keep.sum(), np.int8), (C.row[keep], C.col[keep])),
        shape=S.shape,
    )


def pmis_coarsening(Sgraph, seed: int = 0) -> np.ndarray:
    """PMIS C/F splitting (reference: RSPMISCoarsening — random-weight Luby
    rounds on the strength graph). Returns cfmap: True = C point."""
    import scipy.sparse as sp

    n = Sgraph.shape[0]
    ST = Sgraph.T.tocsr()
    G = ((Sgraph + ST) > 0).astype(np.int8).tocsr()
    rng = np.random.default_rng(seed)
    # weight = number of points i strongly influences + random tiebreak
    lam = np.asarray(ST.sum(axis=1)).ravel().astype(np.float64)
    w = lam + rng.random(n)
    cf = np.zeros(n, np.int8)            # 0 undecided, 1 C, 2 F
    # isolated points (no strong connections at all) become C immediately
    iso = (np.diff(G.indptr) == 0)
    cf[iso] = 1
    undecided = cf == 0
    while undecided.any():
        wa = np.where(undecided, w, -np.inf)
        nbr_max = np.full(n, -np.inf)
        ne = np.diff(G.indptr) > 0
        if G.nnz:
            red = np.maximum.reduceat(wa[G.indices], G.indptr[:-1][ne])
            nbr_max[ne] = red
        sel = undecided & (w > nbr_max)
        cf[sel] = 1
        # any undecided point strongly depending on a new C point -> F
        idx = np.where(sel)[0]
        if len(idx):
            dep = ST[idx].indices        # points that depend on these C
            newf = np.zeros(n, bool)
            newf[dep] = True
            cf[(cf == 0) & newf] = 2
        undecided = cf == 0
        if not sel.any():
            cf[undecided] = 1            # safety: no progress -> all C
            break
    return cf == 1


def direct_interpolation(S, Sgraph, cfmap: np.ndarray):
    """Direct interpolation (reference: RSDirectInterpolation):
    F point i: w_ij = -(alpha|beta) a_ij / a_ii over strong C neighbors,
    alpha/beta = row sums of all negative/positive off-diagonals divided by
    the corresponding sums over the interpolatory set. C points: identity.
    """
    import scipy.sparse as sp

    n = S.shape[0]
    coarse_idx = np.cumsum(cfmap) - 1      # C index per row (valid where C)
    nc = int(cfmap.sum())
    from .aggregation import _pattern_member

    A = S.tocoo()
    offd = A.row != A.col
    strong = (_pattern_member(Sgraph, A.row, A.col)
              if Sgraph.nnz else np.zeros(len(A.row), bool))
    interp = offd & strong & cfmap[A.col]

    neg = A.data < 0
    pos = (A.data > 0) & offd
    sum_neg = np.zeros(n); sum_pos = np.zeros(n)
    np.add.at(sum_neg, A.row[offd & neg], A.data[offd & neg])
    np.add.at(sum_pos, A.row[pos], A.data[pos])
    sum_neg_C = np.zeros(n); sum_pos_C = np.zeros(n)
    np.add.at(sum_neg_C, A.row[interp & neg], A.data[interp & neg])
    np.add.at(sum_pos_C, A.row[interp & pos], A.data[interp & pos])
    diag = np.zeros(n)
    np.add.at(diag, A.row[~offd], A.data[~offd])
    # positive off-diagonals with no positive interpolatory entries get
    # lumped into the diagonal (standard direct-interp treatment)
    no_posC = sum_pos_C == 0
    diag_eff = diag + np.where(no_posC, sum_pos, 0.0)

    alpha = np.where(sum_neg_C != 0, sum_neg / np.where(sum_neg_C == 0, 1, sum_neg_C), 0.0)
    beta = np.where(sum_pos_C != 0, sum_pos / np.where(sum_pos_C == 0, 1, sum_pos_C), 0.0)

    sel = interp & ~cfmap[A.row]
    rfac = np.where(A.data[sel] < 0, alpha[A.row[sel]], beta[A.row[sel]])
    wvals = -rfac * A.data[sel] / diag_eff[A.row[sel]]
    rows = A.row[sel]
    cols = coarse_idx[A.col[sel]]
    # C rows: identity
    crows = np.where(cfmap)[0]
    P = sp.csr_matrix(
        (np.concatenate([wvals, np.ones(nc, S.dtype)]),
         (np.concatenate([rows, crows]),
          np.concatenate([cols, coarse_idx[crows]]))),
        shape=(n, nc),
    )
    return P


def rs_level(A: CSR, *, theta: float = 0.25, seed: int = 0,
             interpolation: str = "direct") -> Tuple[CSR, CSR, CSR]:
    """One RS coarsening step: returns (P, R, Ac)."""
    S = _scipy(A)
    Sg = classical_strength(S, theta)
    cfmap = pmis_coarsening(Sg, seed)
    if cfmap.all() or not cfmap.any():
        raise ValueError("RS coarsening failed to split C/F")
    if interpolation != "direct":
        raise NotImplementedError(
            "only direct interpolation implemented (ExtPI planned)"
        )
    P = direct_interpolation(S, Sg, cfmap)
    R = P.T.tocsr()
    Ac = (R @ S @ P).tocsr()
    from .aggregation import _to_csr

    return _to_csr(P), _to_csr(R), _to_csr(Ac)
