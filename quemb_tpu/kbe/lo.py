"""k-point orbital localization (per-k Lowdin, frozen-core aware).

Replacement for the reference ``kbe/lo.py:Mixin_k_Localize.localize``
(lowdin branch, reference kbe/lo.py:262-311): symmetric orthogonalization
per k-point; with frozen core the core projection is removed first and the
remaining valence space re-orthogonalized (population-filtered columns).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lowdin_k"]


def _lowdin_W(S: np.ndarray) -> np.ndarray:
    es, vs = np.linalg.eigh(S)
    keep = es > 1e-14
    return (vs[:, keep] / np.sqrt(es[keep])) @ vs[:, keep].conj().T


def lowdin_k(S_k, C_k, ncore: int = 0, P_core=None):
    """Per-k Lowdin localized orbitals.

    Returns (W_k [nk, nao, nlo], lmo_k [nk, nlo, nmo-ncore]) where lmo_k are
    the occupied+virtual valence MOs expressed in the LO basis
    (reference kbe/lo.py:262).
    """
    S_k = np.asarray(S_k)
    C_k = np.asarray(C_k)
    nk, nao, _ = S_k.shape
    Ws, lmos = [], []
    for k in range(nk):
        W = _lowdin_W(S_k[k])
        for i in range(W.shape[1]):
            if W[i, i].real < 0:
                W[:, i] *= -1
        if ncore > 0:
            pcore = np.eye(nao) - P_core[k] @ S_k[k]
            C_ = pcore @ W
            Cpop = np.diag(
                (C_.conj().T @ S_k[k] @ C_).real
            )
            no_core_idx = np.where(Cpop > 0.7)[0]
            C_ = C_[:, no_core_idx]
            S_ = C_.conj().T @ S_k[k] @ C_
            W = C_ @ _lowdin_W(S_)
        lmo = W.conj().T @ S_k[k] @ C_k[k][:, ncore:]
        Ws.append(W)
        lmos.append(lmo)
    return np.asarray(Ws), np.asarray(lmos)
