"""MP2 fragment solver with unrelaxed RDMs (reference solve_mp2 path).

The reference uses pyscf's ``mp.MP2`` and its ``make_rdm1``/``make_rdm2``
(molbe/solver.py:312-316, 781).  Note that in the reference the MP2 2-RDM is
used as returned by pyscf (mean-field part included) even in the cumulant
energy path - we mirror that behavior for parity.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def mp2_amplitudes(eri_mo, moe, nsocc: int):
    """t2[i,j,a,b] = (ia|jb) / (e_i + e_j - e_a - e_b)."""
    no = nsocc
    ovov = jnp.asarray(eri_mo)[:no, no:, :no, no:]  # (ia|jb)
    eo = moe[:no]
    ev = moe[no:]
    D = (
        eo[:, None, None, None]
        + eo[None, :, None, None]
        - ev[None, None, :, None]
        - ev[None, None, None, :]
    )
    t2 = jnp.transpose(ovov, (0, 2, 1, 3)) / D  # [i,j,a,b]
    e_mp2 = jnp.einsum(
        "ijab,ijab->", t2, 2.0 * jnp.transpose(ovov, (0, 2, 1, 3))
        - jnp.transpose(ovov, (2, 0, 1, 3))
    )
    return np.asarray(t2), float(e_mp2)


def make_rdm1_mp2(t2, nmo: int):
    """Unrelaxed MP2 1-RDM (pyscf mp2.make_rdm1 semantics)."""
    no = t2.shape[0]
    L2 = 2.0 * t2 - t2.transpose(0, 1, 3, 2)
    doo = -2.0 * np.einsum("ikab,jkab->ij", t2, L2)
    dvv = 2.0 * np.einsum("ijac,ijbc->ab", t2, L2)
    dm1 = np.zeros((nmo, nmo))
    dm1[:no, :no] = doo
    dm1[no:, no:] = dvv
    dm1[np.diag_indices(no)] += 2.0
    return dm1


def make_rdm2_mp2(t2, nmo: int):
    """Unrelaxed MP2 2-RDM incl. mean-field part (pyscf make_rdm2)."""
    no = t2.shape[0]
    dm2 = np.zeros((nmo, nmo, nmo, nmo))
    # correlation ovov blocks: dm2[i,a,j,b] = 2 t2[ijab] - t2[jiab]
    gamma = 2.0 * t2 - t2.transpose(1, 0, 2, 3)
    dm2[:no, no:, :no, no:] = gamma.transpose(0, 2, 1, 3)
    dm2[no:, :no, no:, :no] = gamma.transpose(2, 0, 3, 1)
    # mean-field + dm1-coupling part
    dm1 = make_rdm1_mp2(t2, nmo)
    dm1c = dm1.copy()
    dm1c[np.diag_indices(no)] -= 2.0
    for i in range(no):
        dm2[i, i, :, :] += dm1c * 2
        dm2[:, :, i, i] += dm1c * 2
        dm2[:, i, i, :] -= dm1c
        dm2[i, :, :, i] -= dm1c.T
    for i in range(no):
        for j in range(no):
            dm2[i, i, j, j] += 4
            dm2[i, j, j, i] -= 2
    return dm2


def solve_mp2(fr, C, moe, with_dm2=True, use_cumulant=True):
    """Fragment MP2 entry used by the dispatcher."""
    eri_mo = np.asarray(
        jnp.einsum(
            "pqrs,pi,qj,rk,sl->ijkl",
            jnp.asarray(fr.eri),
            *([jnp.asarray(C)] * 4),
        )
    )
    t2, _ = mp2_amplitudes(eri_mo, np.asarray(moe), fr.nsocc)
    nmo = C.shape[1]
    rdm1 = make_rdm1_mp2(t2, nmo)
    rdm2 = make_rdm2_mp2(t2, nmo) if with_dm2 else None
    return rdm1, rdm2
