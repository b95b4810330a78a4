"""Periodic restricted Hartree-Fock with k-points (KRHF).

Self-contained replacement for ``pyscf.pbc.scf.KRHF`` as consumed by the
reference kbe driver (reference kbe/pbe.py:78 takes a converged KRHF and
caches S/hcore/C/dm/veff; the test baseline kbe_polyacetylene_test.py:49
runs KRHF with GDF and ``exxdiv=None``).

Uses the background-regularized integrals of :mod:`kbe.pbc_int` and the
own-aux GDF of :mod:`kbe.df`; all G=0 conventions follow ``exxdiv=None``
(no Madelung correction in the SCF; the kbe driver applies the Ewald
correction to the embedding energy separately, ref kbe/pbe.py:484).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

from quemb_tpu.kbe.cell import Cell
from quemb_tpu.kbe.df import KGDF
from quemb_tpu.kbe.pbc_int import s_t_kpts, vnuc_kpts


class KRHF:
    """Closed-shell k-point HF: complex Fock, per-k DIIS, DF J/K."""

    def __init__(
        self,
        cell: Cell,
        kpts: np.ndarray,
        with_df: KGDF | None = None,
        omega: float = 0.6,
        conv_tol: float = 1e-10,
        # the near-linearly-dependent default (l_extra=1) aux leaves
        # fit-conditioning noise that stretches the DIIS tail below
        # ~1e-10; 300 cycles covers conv_tol=1e-11 on such cells
        max_cycle: int = 300,
    ):
        self.cell = cell
        self.kpts = np.asarray(kpts).reshape(-1, 3)
        self.nk = len(self.kpts)
        self.with_df = with_df or KGDF(cell, self.kpts, omega=omega)
        self.omega = omega
        self.conv_tol = conv_tol
        self.max_cycle = max_cycle
        self.mo_coeff = None
        self.mo_energy = None
        self.e_tot = None
        self.converged = False
        self._S = None
        self._hcore = None
        self.exxdiv = None  # only exxdiv=None supported (ref test config)

    # ------------------------------------------------------------- integrals
    def get_ovlp(self):
        if self._S is None:
            self._S, self._T = s_t_kpts(self.cell, self.kpts)
        return self._S

    def get_hcore(self):
        if self._hcore is None:
            S = self.get_ovlp()
            V = vnuc_kpts(
                self.cell, self.kpts, omega=min(self.omega, 0.4), S_k=S
            )
            self._hcore = self._T + V
        return self._hcore

    def energy_nuc(self):
        return self.cell.ewald()

    def get_veff(self, dm_kpts):
        J, K = self.with_df.get_jk(dm_kpts)
        return J - 0.5 * K

    def make_rdm1(self, mo_coeff=None, nocc=None):
        C = self.mo_coeff if mo_coeff is None else mo_coeff
        nocc = self.cell.nelectron // 2 if nocc is None else nocc
        return np.asarray(
            [2.0 * C[k][:, :nocc] @ C[k][:, :nocc].conj().T
             for k in range(self.nk)]
        )

    # ------------------------------------------------------------------- SCF
    def kernel(self, dm0=None):
        if not self.with_df._built:
            self.with_df.build()
        S = self.get_ovlp()
        h = self.get_hcore()
        nk = self.nk
        nocc = self.cell.nelectron // 2

        def eig_all(F):
            moes, Cs = [], []
            for k in range(nk):
                w, v = scipy.linalg.eigh(F[k], S[k])
                moes.append(w)
                Cs.append(v)
            return np.asarray(moes), np.asarray(Cs)

        if dm0 is None:
            _, C = eig_all(h)
            self.mo_coeff = C
            dm = self.make_rdm1(C, nocc)
        else:
            dm = dm0

        e_nuc = self.energy_nuc()
        e_last = 0.0
        diis_err, diis_F = [], []
        for it in range(self.max_cycle):
            veff = self.get_veff(dm)
            F = h + veff
            # DIIS on the stacked k-blocks
            err = np.asarray(
                [F[k] @ dm[k] @ S[k] - S[k] @ dm[k] @ F[k] for k in range(nk)]
            )
            diis_err.append(err.ravel())
            diis_F.append(F.copy())
            if len(diis_err) > 8:
                diis_err.pop(0)
                diis_F.pop(0)
            if it > 0:
                m = len(diis_err)
                B = np.empty((m + 1, m + 1), dtype=np.complex128)
                B[:m, :m] = np.asarray(
                    [[np.vdot(a, b) for b in diis_err] for a in diis_err]
                )
                B[m, :m] = -1.0
                B[:m, m] = -1.0
                B[m, m] = 0.0
                rhs = np.zeros(m + 1, dtype=np.complex128)
                rhs[m] = -1.0
                try:
                    c = np.linalg.lstsq(B, rhs, rcond=None)[0][:m]
                    F = np.einsum("i,ikuv->kuv", c, np.asarray(diis_F))
                except np.linalg.LinAlgError:
                    pass
            moe, C = eig_all(F)
            self.mo_energy, self.mo_coeff = moe, C
            dm = self.make_rdm1(C, nocc)
            e1 = np.mean(
                [np.einsum("uv,vu->", h[k], dm[k]) for k in range(nk)]
            )
            e2 = 0.5 * np.mean(
                [np.einsum("uv,vu->", veff[k], dm[k]) for k in range(nk)]
            )
            e_el = (e1 + e2).real
            e_tot = e_el + e_nuc
            if abs(e_tot - e_last) < self.conv_tol and it > 1:
                self.converged = True
                self.e_tot = e_tot
                break
            e_last = e_tot
        else:
            self.e_tot = e_last
        # final veff with converged density
        self.hf_dm = dm
        self.hf_veff = self.get_veff(dm)
        self.e_tot = (
            np.mean(
                [np.einsum("uv,vu->", h[k] + 0.5 * self.hf_veff[k], dm[k])
                 for k in range(nk)]
            ).real
            + e_nuc
        )
        return self.e_tot
