"""Density-fitted integral machinery (reference L4: eri_onthefly.py,
eri_sparse_DF.py + _cpp/eri_sparse_DF.cpp).

The TPU-native formulation: the 3-center factor ``B[P, mu, nu]`` lives in
HBM; each fragment's (ij|kl) is two MXU matmul quarter-transforms
``(P|ij) = TA^T (P|mu nu) TA`` followed by a triangular solve against the
Cholesky factor of the metric and one Gram matmul - the direct analog of the
reference's C++ ``transform_integral`` (eri_sparse_DF.cpp:739) with dense
blocked tensors instead of CPU sparse maps.

The auxiliary basis can be a tabulated set or generated even-tempered
("autoaux") from the orbital basis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import scipy.linalg

from quemb_tpu.chem import integrals
from quemb_tpu.chem.mole import Mole


def make_even_tempered_auxbasis(
    mol: Mole, beta: float = 1.8, l_max_inc: int = 2
) -> Mole:
    """Even-tempered auxiliary basis generated from the orbital basis.

    For each atom: uncontracted shells with exponents spanning
    [2*min, 2*max] of the products of orbital exponents, geometric ratio
    ``beta``, for l up to (max orbital l + l_max_inc).  This is the standard
    "autoaux" recipe used when no tabulated fitting basis is available.
    """
    aux = Mole.__new__(Mole)
    aux.basis = "autoaux"
    aux.charge = mol.charge
    aux.spin = mol.spin
    aux._atoms = list(mol._atoms)
    from quemb_tpu.chem.mole import Shell, ncart

    shells = []
    offset = 0
    aux._aoslice = []
    for ia in range(mol.natm):
        start = offset
        at_shells = [sh for sh in mol.shells if sh.atom_idx == ia]
        exps = np.concatenate([sh.exps for sh in at_shells])
        l_orb = max(sh.l for sh in at_shells)
        e_min, e_max = exps.min(), 2.0 * exps.max()
        for l in range(l_orb + l_max_inc + 1):
            n_shells = max(
                1, int(np.ceil(np.log(e_max / e_min) / np.log(beta))) + 1
            )
            es = e_min * beta ** np.arange(n_shells)
            for a in es:
                from quemb_tpu.chem.mole import _normalize_contraction

                coefs = _normalize_contraction(l, [a], [1.0])
                shells.append(
                    Shell(
                        l, np.array([a]), coefs,
                        np.asarray(mol._atoms[ia][1]), ia, offset,
                    )
                )
                offset += ncart(l)
        aux._aoslice.append((start, offset))
    aux.shells = shells
    aux.nao = offset
    return aux


class DFTensor:
    """Cholesky-whitened 3-center factor: eri ~ sum_P B[P,mu,nu] B[P,la,si]."""

    def __init__(self, mol: Mole, auxmol: Mole | None = None):
        self.mol = mol
        self.auxmol = auxmol or make_even_tempered_auxbasis(mol)
        J = integrals.int2c2e(self.auxmol)  # (P|Q)
        P3 = integrals.int3c2e(mol, self.auxmol)  # [nao, nao, naux]
        naux = self.auxmol.nao
        rhs = P3.reshape(-1, naux).T  # [naux, nao*nao]
        # Whiten against the metric; ETB sets can be near-linearly-dependent,
        # so use the eigh pseudo-inverse square root (the reference's
        # cholesky-or-eig fallback, kbe/eri_onthefly.py:18).
        try:
            L = scipy.linalg.cholesky(J, lower=True)
            B = scipy.linalg.solve_triangular(L, rhs, lower=True)
        except np.linalg.LinAlgError:
            w, V = np.linalg.eigh(J)
            keep = w > 1e-10 * w.max()
            B = (V[:, keep] / np.sqrt(w[keep])).T @ rhs
            naux = int(keep.sum())
        self.B = B.reshape(naux, mol.nao, mol.nao)
        self.naux = naux

    def eri_full(self) -> np.ndarray:
        """Dense 4-center ERI reconstructed from the DF factors."""
        B = self.B.reshape(self.naux, -1)
        eri = B.T @ B
        n = self.mol.nao
        return eri.reshape(n, n, n, n)


@jax.jit
def df_fragment_eri(B, TA):
    """(ij|kl) for one fragment from the whitened DF factor.

    B: [naux, nao, nao]; TA: [nao, nemb].  Two MXU quarter transforms + one
    Gram matmul (the dense analog of eri_sparse_DF.cpp:739
    ``transform_integral``).
    """
    Bi = jnp.einsum("pmn,mi->pin", B, TA)
    Bij = jnp.einsum("pin,nj->pij", Bi, TA)
    naux = B.shape[0]
    nemb = TA.shape[1]
    Bf = Bij.reshape(naux, nemb * nemb)
    eri = Bf.T @ Bf
    return eri.reshape(nemb, nemb, nemb, nemb)


def df_transform_batched(B, TA_b):
    """vmapped fragment DF transforms for a bucket of TAs [nf, nao, nemb]."""
    B = jnp.asarray(B)
    return jax.vmap(lambda TA: df_fragment_eri(B, TA))(jnp.asarray(TA_b))
