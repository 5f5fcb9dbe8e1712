"""Vectorized path×edge crossing kernels for the distributed arrangement.

Given K probe paths (P_k, Q_k) and M edges (C_m, D_m), computes the
K×M crossing matrix in one triage pass (the same four orientation
determinants as S2::CrossingSign, s2edge_crossings.cc:30-58) with a
scalar robust fallback (exact sign + symbolic perturbation,
kernel/predicates.py) for pairs that triage cannot decide or that share
a vertex bit-exactly.

Three modes:
  - ``parity``: 0/1 counts with EdgeOrVertexCrossing tie-breaking — the
    parity of a row sum is the containment flip along the path
    (S2Loop::BruteForceContains semantics, total for all inputs);
  - ``signed``: ±1/0 winding increments — calibrated like
    kernel.winding.winding_number (leaving a CCW loop across one of its
    edges lowers w by 1), with SignedVertexCrossing
    (s2edge_crossings.cc:393-411) when the path endpoint is bit-equal to
    an edge vertex;
  - ``proper``: boolean proper-crossing matrix (CrossingSign == +1
    exactly) — the cut-discovery predicate for edge splitting.
"""

from __future__ import annotations

import numpy as np

from . import predicates as P


def _triage_signs(Ppts: np.ndarray, Q: np.ndarray, C: np.ndarray, D: np.ndarray):
    """The four (K, M) triaged orientation-sign matrices for paths
    (P_k, Q_k) vs edges (C_m, D_m):
    s_pqc = sign(P,Q,C), s_pqd = sign(P,Q,D),
    s_cdp = sign(C,D,P), s_cdq = sign(C,D,Q)."""
    pxq = np.cross(Ppts, Q)  # (K,3)
    s_pqc = P.triage_sign_det(pxq @ C.T)
    s_pqd = P.triage_sign_det(pxq @ D.T)
    cxd = np.cross(C, D)  # (M,3)
    s_cdp = P.triage_sign_det(Ppts @ cxd.T)
    s_cdq = P.triage_sign_det(Q @ cxd.T)
    return s_pqc, s_pqd, s_cdp, s_cdq


def _shared_vertex_mask(Ppts, Q, C, D) -> np.ndarray:
    """(K, M) True where any path endpoint is bit-equal to any edge
    endpoint (the vertex-crossing cases)."""
    eq = lambda X, Y: (X[:, None, :] == Y[None, :, :]).all(-1)
    return eq(Ppts, C) | (eq(Ppts, D)) | eq(Q, C) | eq(Q, D)


def paths_cross_edges(
    Ppts: np.ndarray,
    Q: np.ndarray,
    C: np.ndarray,
    D: np.ndarray,
    mode: str = "parity",
) -> np.ndarray:
    """(K, M) crossing matrix; see module docstring for the modes."""
    Ppts = np.asarray(Ppts, float).reshape(-1, 3)
    Q = np.asarray(Q, float).reshape(-1, 3)
    C = np.asarray(C, float).reshape(-1, 3)
    D = np.asarray(D, float).reshape(-1, 3)
    K, M = len(Ppts), len(C)
    if K == 0 or M == 0:
        return np.zeros((K, M), dtype=np.int64)
    s_pqc, s_pqd, s_cdp, s_cdq = _triage_signs(Ppts, Q, C, D)

    # CrossingSign's certain cases: a proper crossing needs all four
    # signs equal (after the acb/bda/cbd/dac sign juggling); two certain
    # opposite signs on one great circle rule a crossing out.
    acb = -s_pqc
    bda = s_pqd
    cbd = -s_cdq
    dac = s_cdp
    shared = _shared_vertex_mask(Ppts, Q, C, D)
    all_certain = (acb != 0) & (bda != 0) & (cbd != 0) & (dac != 0)
    certain_no = ((acb != 0) & (bda != 0) & (acb != bda)) | (
        (cbd != 0) & (dac != 0) & (cbd != dac)
    )
    decided = (all_certain | certain_no) & ~shared
    proper = decided & (acb == bda) & (cbd == acb) & (dac == acb)
    fallback = ~decided

    if mode == "proper":
        out = proper.copy()
        if fallback.any():
            for ki, mi in zip(*np.nonzero(fallback)):
                out[ki, mi] = (
                    P.crossing_sign(Ppts[ki], Q[ki], C[mi], D[mi]) > 0
                )
        return out.astype(np.int64)

    if mode == "parity":
        out = proper.astype(np.int64)
        if fallback.any():
            for ki, mi in zip(*np.nonzero(fallback)):
                out[ki, mi] = int(
                    P.edge_or_vertex_crossing(Ppts[ki], Q[ki], C[mi], D[mi])
                )
        return out

    if mode == "signed":
        # winding increment of a proper crossing: −1 when the edge ends
        # on the positive side of the path plane (kernel.winding
        # calibration); certain s_pqd gives the sign without a fallback
        delta = np.where(s_pqd > 0, -1, 1)
        out = np.where(proper, delta, 0).astype(np.int64)
        # proper crossings with uncertain s_pqd triage: exact sign
        amb = proper & (s_pqd == 0)
        for ki, mi in zip(*np.nonzero(amb)):
            out[ki, mi] = (
                -1 if int(P.sign(Ppts[ki][None], Q[ki][None], D[mi][None])[0]) > 0
                else 1
            )
        if fallback.any():
            for ki, mi in zip(*np.nonzero(fallback)):
                cs = P.crossing_sign(Ppts[ki], Q[ki], C[mi], D[mi])
                if cs > 0:
                    out[ki, mi] = (
                        -1
                        if int(P.sign(Ppts[ki][None], Q[ki][None], D[mi][None])[0]) > 0
                        else 1
                    )
                elif cs == 0:
                    # path endpoint bit-equal to an edge vertex: signed
                    # counting is ill-defined here (same contract as
                    # kernel.winding.winding_number) — callers retry with
                    # a different probe point / anchor candidate
                    raise ValueError(
                        "degenerate signed crossing: path endpoint "
                        "coincides with an edge vertex"
                    )
        return out

    raise ValueError(f"unknown mode {mode!r}")


def paths_cross_edges_rowwise(
    Ppts: np.ndarray,
    Q: np.ndarray,
    C: np.ndarray,
    D: np.ndarray,
    mode: str = "parity",
) -> np.ndarray:
    """Elementwise variant: crossing count of path (P_i, Q_i) with edge
    (C_i, D_i) per row i — the join-shaped layout of the distributed
    anchor jobs (operators/arrangement.py)."""
    Ppts = np.asarray(Ppts, float).reshape(-1, 3)
    Q = np.asarray(Q, float).reshape(-1, 3)
    C = np.asarray(C, float).reshape(-1, 3)
    D = np.asarray(D, float).reshape(-1, 3)
    n = len(Ppts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    pxq = np.cross(Ppts, Q)
    cxd = np.cross(C, D)
    s_pqc = P.triage_sign_det((pxq * C).sum(1))
    s_pqd = P.triage_sign_det((pxq * D).sum(1))
    s_cdp = P.triage_sign_det((cxd * Ppts).sum(1))
    s_cdq = P.triage_sign_det((cxd * Q).sum(1))
    acb, bda, cbd, dac = -s_pqc, s_pqd, -s_cdq, s_cdp
    eq = lambda X, Y: (X == Y).all(1)
    shared = eq(Ppts, C) | eq(Ppts, D) | eq(Q, C) | eq(Q, D)
    all_certain = (acb != 0) & (bda != 0) & (cbd != 0) & (dac != 0)
    certain_no = ((acb != 0) & (bda != 0) & (acb != bda)) | (
        (cbd != 0) & (dac != 0) & (cbd != dac)
    )
    decided = (all_certain | certain_no) & ~shared
    proper = decided & (acb == bda) & (cbd == acb) & (dac == acb)
    fallback = ~decided

    if mode == "parity":
        out = proper.astype(np.int64)
        for i in np.nonzero(fallback)[0].tolist():
            out[i] = int(P.edge_or_vertex_crossing(Ppts[i], Q[i], C[i], D[i]))
        return out
    if mode == "signed":
        delta = np.where(s_pqd > 0, -1, 1)
        out = np.where(proper, delta, 0).astype(np.int64)
        for i in np.nonzero(proper & (s_pqd == 0))[0].tolist():
            out[i] = (
                -1 if int(P.sign(Ppts[i][None], Q[i][None], D[i][None])[0]) > 0
                else 1
            )
        for i in np.nonzero(fallback)[0].tolist():
            cs = P.crossing_sign(Ppts[i], Q[i], C[i], D[i])
            if cs > 0:
                out[i] = (
                    -1
                    if int(P.sign(Ppts[i][None], Q[i][None], D[i][None])[0]) > 0
                    else 1
                )
            elif cs == 0:
                raise ValueError(
                    "degenerate signed crossing: path endpoint "
                    "coincides with an edge vertex"
                )
        return out
    raise ValueError(f"unknown mode {mode!r}")
