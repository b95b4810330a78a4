"""UCCSD for embedded fragments (general spin-orbital CCSD).

Replaces the reference's pyscf UCCSD path (molbe/solver.py:1029 solve_uccsd +
shared/external/uccsd_eri.py, ccsd_rdm.py).  Reuses the generalized
spin-orbital CCSD update (non-diagonal Fock) from :mod:`solvers.ccsd`; the
three spin ERI blocks (aa, bb, ab) assemble into one spin-blocked chemist
tensor whose zero blocks encode the spin selection rules.
"""

from __future__ import annotations

import warnings

import numpy as np

import jax
import jax.numpy as jnp

from quemb_tpu.solvers.ccsd_mat import BLOCK_KEYS, ccsd_update_mat, fused_blocks


def _spin_blocked_chemist(Vaa, Vbb, Vab):
    na = Vaa.shape[0]
    nb = Vbb.shape[0]
    n = na + nb
    V = np.zeros((n, n, n, n))
    V[:na, :na, :na, :na] = Vaa
    V[na:, na:, na:, na:] = Vbb
    V[:na, :na, na:, na:] = Vab
    V[na:, na:, :na, :na] = np.transpose(Vab, (2, 3, 0, 1))
    return V


def solve_uccsd_so(
    Vaa_mo, Vbb_mo, Vab_mo, f_a_mo, f_b_mo, nocc_a: int, nocc_b: int,
    conv_tol: float = 1e-8, max_cycle: int = 200,
):
    """General spin-orbital CCSD over two spin channels.

    All inputs are in the respective fragment-MO bases.  Returns the spatial
    amplitude blocks (t1a, t1b, t2aa, t2ab, t2bb) and the correlation energy.
    """
    na = f_a_mo.shape[0]
    nb = f_b_mo.shape[0]
    n = na + nb
    nva, nvb = na - nocc_a, nb - nocc_b
    V = _spin_blocked_chemist(np.asarray(Vaa_mo), np.asarray(Vbb_mo),
                              np.asarray(Vab_mo))
    phys = V.transpose(0, 2, 1, 3)
    g = phys - phys.transpose(0, 1, 3, 2)

    f = np.zeros((n, n))
    f[:na, :na] = f_a_mo
    f[na:, na:] = f_b_mo

    occ = list(range(nocc_a)) + list(range(na, na + nocc_b))
    vir = [p for p in range(n) if p not in set(occ)]
    order = np.array(occ + vir)
    g = g[np.ix_(order, order, order, order)]
    f = f[np.ix_(order, order)]
    no = nocc_a + nocc_b
    nv = n - no

    o, v = slice(0, no), slice(no, n)
    moe = np.diag(f)
    moe_o, moe_v = jnp.asarray(moe[:no]), jnp.asarray(moe[no:])
    f_oo_off = jnp.asarray(f[o, o] - np.diag(moe[:no]))
    f_ov = jnp.asarray(f[o, v])
    f_vv_off = jnp.asarray(f[v, v] - np.diag(moe[no:]))
    blocks4 = dict(
        oovv=g[o, o, v, v], ovvv=g[o, v, v, v], ooov=g[o, o, o, v],
        oooo=g[o, o, o, o], vvvv=g[v, v, v, v], ovov=g[o, v, o, v],
        ovvo=g[o, v, v, o], ovoo=g[o, v, o, o], vvvo=g[v, v, v, o],
    )
    fb = {
        k: jnp.asarray(vv)
        for k, vv in fused_blocks(blocks4, no, nv).items()
    }
    Dov = moe[:no, None] - moe[None, no:]
    Doovv = (
        moe[:no, None, None, None]
        + moe[None, :no, None, None]
        - moe[None, None, no:, None]
        - moe[None, None, None, no:]
    )
    t1 = jnp.asarray(f[o, v] / Dov)
    T2p = jnp.asarray(
        (g[o, o, v, v] / Doovv).reshape(no * no, nv * nv)
    )

    errs: list = []
    amps: list = []
    e_corr = 0.0
    norm_dt = np.inf
    for it in range(max_cycle):
        t1n, t2n, e_corr = ccsd_update_mat(
            t1, T2p, moe_o, moe_v, fb, f_oo_off=f_oo_off, f_ov=f_ov,
            f_vv_off=f_vv_off,
        )
        dt = np.concatenate(
            [np.asarray(t1n - t1).ravel(), np.asarray(t2n - T2p).ravel()]
        )
        amp = np.concatenate([np.asarray(t1n).ravel(),
                              np.asarray(t2n).ravel()])
        norm_dt = float(np.linalg.norm(dt))
        errs.append(dt)
        amps.append(amp)
        if len(errs) > 8:
            errs.pop(0)
            amps.pop(0)
        if len(errs) > 1:
            nb_ = len(errs)
            B = np.empty((nb_ + 1, nb_ + 1))
            B[-1, :] = -1.0
            B[:, -1] = -1.0
            B[-1, -1] = 0.0
            for i in range(nb_):
                for j in range(nb_):
                    B[i, j] = errs[i] @ errs[j]
            rhs = np.zeros(nb_ + 1)
            rhs[-1] = -1.0
            try:
                c = np.linalg.solve(B, rhs)[:nb_]
                amp = sum(ci * ai for ci, ai in zip(c, amps))
            except np.linalg.LinAlgError:
                pass
        n1 = no * nv
        t1 = jnp.asarray(amp[:n1].reshape(no, nv))
        T2p = jnp.asarray(amp[n1:].reshape(no * no, nv * nv))
        if norm_dt < conv_tol and it > 0:
            break
    else:
        warnings.warn(f"UCCSD did not converge: |dt| = {norm_dt:.2e}")

    t1f = np.asarray(t1)
    t2f = np.asarray(T2p).reshape(no, no, nv, nv)
    t1a = t1f[:nocc_a, :nva]
    t1b = t1f[nocc_a:, nva:]
    t2aa = t2f[:nocc_a, :nocc_a, :nva, :nva]
    t2ab = t2f[:nocc_a, nocc_a:, :nva, nva:]
    t2bb = t2f[nocc_a:, nocc_a:, nva:, nva:]
    return (t1a, t1b), (t2aa, t2ab, t2bb), float(e_corr)


def make_rdm1_uccsd(t1s, noccs):
    """lambda=0 UCCSD 1-RDMs per spin (occupancy 1)."""
    out = []
    for t1, no in zip(t1s, noccs):
        nmo = no + t1.shape[1]
        dm = np.zeros((nmo, nmo))
        dm[:no, no:] = t1
        dm[no:, :no] = t1.T
        dm[np.diag_indices(no)] += 1.0
        out.append(dm)
    return tuple(out)


def make_rdm2_uccsd(t1s, t2s, noccs, with_dm1=False):
    """lambda=0 UCCSD 2-RDM spin blocks (aa, ab, bb) in chemist notation.

    Cumulant-only when with_dm1=False (matching use_cumulant=True).
    """
    t1a, t1b = t1s
    t2aa, t2ab, t2bb = t2s
    na_o, nb_o = noccs
    na = na_o + t1a.shape[1]
    nb = nb_o + t1b.shape[1]

    def _ss(t1, t2, no, nmo):
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) - np.einsum(
            "ib,ja->ijab", t1, t1
        )
        dm2 = np.zeros((nmo, nmo, nmo, nmo))
        g = 0.5 * tau
        dm2[:no, no:, :no, no:] = g.transpose(0, 2, 1, 3)
        dm2[no:, :no, no:, :no] = g.transpose(2, 0, 3, 1)
        return dm2

    dm2aa = _ss(t1a, t2aa, na_o, na)
    dm2bb = _ss(t1b, t2bb, nb_o, nb)

    tau_ab = t2ab + np.einsum("ia,jb->ijab", t1a, t1b)
    g_ab = 0.5 * tau_ab
    dm2ab = np.zeros((na, na, nb, nb))
    dm2ab[:na_o, na_o:, :nb_o, nb_o:] = g_ab.transpose(0, 2, 1, 3)
    dm2ab[na_o:, :na_o, nb_o:, :nb_o] = g_ab.transpose(2, 0, 3, 1)

    if with_dm1:
        dm1a, dm1b = make_rdm1_uccsd((t1a, t1b), noccs)
        d1a = dm1a.copy()
        d1a[np.diag_indices(na_o)] -= 1.0
        d1b = dm1b.copy()
        d1b[np.diag_indices(nb_o)] -= 1.0
        for i in range(na_o):
            dm2aa[i, i, :, :] += d1a
            dm2aa[:, :, i, i] += d1a
            dm2aa[:, i, i, :] -= d1a
            dm2aa[i, :, :, i] -= d1a.T
        for i in range(nb_o):
            dm2bb[i, i, :, :] += d1b
            dm2bb[:, :, i, i] += d1b
            dm2bb[:, i, i, :] -= d1b
            dm2bb[i, :, :, i] -= d1b.T
        for i in range(na_o):
            dm2ab[i, i, :, :] += d1b
        for i in range(nb_o):
            dm2ab[:, :, i, i] += d1a
        for i in range(na_o):
            for j in range(na_o):
                dm2aa[i, i, j, j] += 1
                dm2aa[i, j, j, i] -= 1
        for i in range(nb_o):
            for j in range(nb_o):
                dm2bb[i, i, j, j] += 1
                dm2bb[i, j, j, i] -= 1
        for i in range(na_o):
            for j in range(nb_o):
                dm2ab[i, i, j, j] += 1
    return dm2aa, dm2ab, dm2bb


@jax.jit
def _mo4(V, C1, C2, C3, C4):
    return jnp.einsum("pqrs,pi,qj,rk,sl->ijkl", V, C1, C2, C3, C4)


def solve_uccsd(fr_a, fr_b, Vab, use_cumulant=True):
    """Fragment-pair UCCSD entry (reference molbe/solver.py be_func_u path).

    fr_a/fr_b: alpha/beta :class:`Fragment` objects after their spin-channel
    SCFs (mo_coeffs set).  Vab: the cross-spin ERI block in the embedding
    bases [na, na, nb, nb].  Returns (rdm1s, rdm2s, e_corr).
    """
    Ca = jnp.asarray(fr_a.mo_coeffs)
    Cb = jnp.asarray(fr_b.mo_coeffs)
    Vaa_mo = np.asarray(_mo4(jnp.asarray(fr_a.eri), Ca, Ca, Ca, Ca))
    Vbb_mo = np.asarray(_mo4(jnp.asarray(fr_b.eri), Cb, Cb, Cb, Cb))
    Vab_mo = np.asarray(_mo4(jnp.asarray(Vab), Ca, Ca, Cb, Cb))
    # UCC Fock: h1 + veff0 (reference uccsd_eri.frank_get_fock reduces to
    # this for both frozen and unfrozen cases)
    f_a = fr_a.mo_coeffs.T @ (fr_a.h1 + fr_a.veff0) @ fr_a.mo_coeffs
    f_b = fr_b.mo_coeffs.T @ (fr_b.h1 + fr_b.veff0) @ fr_b.mo_coeffs
    t1s, t2s, e_corr = solve_uccsd_so(
        Vaa_mo, Vbb_mo, Vab_mo, f_a, f_b, fr_a.nsocc, fr_b.nsocc
    )
    rdm1s = make_rdm1_uccsd(t1s, (fr_a.nsocc, fr_b.nsocc))
    rdm2s = make_rdm2_uccsd(
        t1s, t2s, (fr_a.nsocc, fr_b.nsocc), with_dm1=not use_cumulant
    )
    return rdm1s, rdm2s, e_corr
