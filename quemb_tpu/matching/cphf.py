"""Coupled-perturbed HF response + analytic BE Jacobian assembly.

Reimplements the reference's ``shared/external/cphf_utils.py`` (batched CPHF
kernel) and ``shared/external/optqn.py:250-491`` (block Jacobian of the
matching conditions).  The CPHF solve for all matching potentials at once is
one batched dense linear solve - ideal MXU work.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from quemb_tpu.embed.fragment import Fragment
from quemb_tpu.solvers.dispatch import run_fragment_scf


def cphf_kernel_batch(C, moe, eri, no, vs):
    """Solve the CPHF equations A u = b for many perturbations v at once.

    C: [n, n] MOs; moe: orbital energies; eri: dense [n]*4 chemist ERIs in
    the same basis as C; no: number of occupied; vs: [npot, n, n].
    Returns us: [npot, no*nv].
    """
    C = jnp.asarray(C)
    eri = jnp.asarray(eri)
    moe = jnp.asarray(moe)
    n = C.shape[0]
    nv = n - no
    Co, Cv = C[:, :no], C[:, no:]
    Vovov = jnp.einsum("pqrs,pi,qa,rj,sb->iajb", eri, Co, Cv, Co, Cv)
    Voovv = jnp.einsum("pqrs,pi,qj,ra,sb->ijab", eri, Co, Co, Cv, Cv)
    A = (
        4.0 * Vovov
        - Vovov.transpose(0, 3, 2, 1)
        - Voovv.transpose(0, 2, 1, 3)
    ).reshape(no * nv, no * nv)
    denom = (moe[:no, None] - moe[None, no:]).ravel()
    A = A - jnp.diag(denom)
    B0s = jnp.einsum("xpq,pi,qa->iax", jnp.asarray(np.array(vs)), Co, Cv)
    B0s = B0s.reshape(no * nv, len(vs))
    # host solve: A is non-symmetric and small; the TPU backend lacks f64 LU
    us = np.linalg.solve(np.asarray(A), np.asarray(B0s)).T
    return us


def get_rhf_dP_from_u(C, no, u):
    n = C.shape[0]
    nv = n - no
    dP = -C[:, :no] @ u.reshape(no, nv) @ C[:, no:].T
    return dP + dP.T


def get_vpots_frag(nao, relAO_per_edge, AO_in_frag):
    """Unit perturbation per matching condition + chem-pot (optqn.py:464)."""
    vpots = []
    for edge in relAO_per_edge:
        for j in range(len(edge)):
            for k in range(j, len(edge)):
                v = np.zeros((nao, nao))
                v[edge[j], edge[k]] = v[edge[k], edge[j]] = 1.0
                vpots.append(v)
    v = np.zeros((nao, nao))
    edge_set = {i for sub in relAO_per_edge for i in sub}
    for i in range(len(AO_in_frag)):
        if i not in edge_set:
            v[i, i] = -1.0
    vpots.append(v)
    return vpots


def hf_response(fr: Fragment):
    """HF CPHF responses dP per matching condition (optqn.py hfres_func)."""
    vpots = get_vpots_frag(fr.nao, fr.relAO_per_edge, fr.AO_in_frag)
    moe, C = run_fragment_scf(fr)
    us = cphf_kernel_batch(C, moe, fr.eri, fr.nsocc, vpots)
    dPs = [
        get_rhf_dP_from_u(C, fr.nsocc, us[i]) for i in range(len(vpots) - 1)
    ]
    dP_mu = get_rhf_dP_from_u(C, fr.nsocc, us[-1])
    return dPs, dP_mu


def _dPmp2_batch(C, moe, eri, no, vs):
    """Analytic MP2 density response dP/dlambda for many perturbations.

    Own formulation of the reference's ``get_dPmp2_batch_r``
    (shared/external/cpmp2_utils.py:94): CPHF orbital response + Fock
    derivative + amplitude derivative, assembled as one vmapped jax program
    over the perturbations.  Returns dPs in the AO(embedding) basis,
    [npot, n, n], with the reference's normalization (x2, before the 0.5
    of optqn.py:446 mp2res_func).
    """
    import jax

    n = C.shape[0]
    nv = n - no
    C = jnp.asarray(C)
    eri = jnp.asarray(eri)
    moe = jnp.asarray(moe)
    Co, Cv = C[:, :no], C[:, no:]
    Vovov = jnp.einsum(
        "pqrs,pi,qa,rj,sb->iajb", eri, Co, Cv, Co, Cv, optimize=True
    )
    Dia = moe[:no, None] - moe[None, no:]
    Diajb = (
        Dia[:, :, None, None] + Dia[None, None, :, :]
    )
    t2 = Vovov / Diajb

    def pmp2(t2l, t2r):
        k = 2.0 * t2r - jnp.transpose(t2r, (0, 3, 2, 1))
        Poo = -jnp.einsum("iajb,majb->im", t2l, k, optimize=True)
        Pvv = jnp.einsum("iajb,icjb->ac", t2l, k, optimize=True)
        Z = jnp.zeros((no, nv))
        return jnp.block([[Poo, Z], [Z.T, Pvv]])

    P = pmp2(t2, t2) + jnp.diag(
        jnp.concatenate([jnp.ones(no), jnp.zeros(nv)])
    )

    us = cphf_kernel_batch(C, moe, eri, no, vs)  # [npot, no*nv]

    def one(u, Q):
        uov = u.reshape(no, nv)
        dP_hf = -Co @ uov @ Cv.T
        dP_hf = dP_hf + dP_hf.T
        vj = jnp.einsum("pqrs,rs->pq", eri, 2.0 * dP_hf)
        vk = jnp.einsum("prqs,rs->pq", eri, 2.0 * dP_hf)
        dF = Q + vj - 0.5 * vk
        dmoe = jnp.einsum("pi,qi,pq->i", C, C, dF)
        dDia = dmoe[:no, None] - dmoe[None, no:]
        dDiajb = dDia[:, :, None, None] + dDia[None, None, :, :]
        # full orbital-rotation matrix (oo/vv from dF, ov from CPHF u)
        eo, ev = moe[:no], moe[no:]
        Dij = -eo[:, None] + eo[None, :] + jnp.eye(no)
        dUoo = (Co.T @ dF @ Co) / Dij * (1.0 - jnp.eye(no))
        Dab = -ev[:, None] + ev[None, :] + jnp.eye(nv)
        dUvv = (Cv.T @ dF @ Cv) / Dab * (1.0 - jnp.eye(nv))
        U = jnp.block([[dUoo, uov], [-uov.T, dUvv]])
        dC = C @ U
        dCo, dCv = dC[:, :no], dC[:, no:]
        V1 = jnp.einsum(
            "pqrs,pi,qa,rj,sb->iajb", eri, Co, Cv, Co, dCv, optimize=True
        )
        V2 = jnp.einsum(
            "pqrs,pi,qa,rj,sb->iajb", eri, Co, Cv, dCo, Cv, optimize=True
        )
        dVovov = (
            V1
            + jnp.transpose(V1, (2, 3, 0, 1))
            + V2
            + jnp.transpose(V2, (2, 3, 0, 1))
        )
        dt2 = (dVovov - t2 * dDiajb) / Diajb
        dP_rot = U @ P - P @ U
        dP2 = pmp2(dt2, t2)
        dP2 = dP2 + dP2.T
        dP_mo = (dP_rot + dP2) * 2.0
        return C @ dP_mo @ C.T

    dPs = jax.vmap(one)(jnp.asarray(us), jnp.asarray(np.array(vs)))
    return np.asarray(dPs)


def mp2_response(fr: Fragment):
    """CP-MP2 responses per matching condition (ref optqn.py:441)."""
    vpots = get_vpots_frag(fr.nao, fr.relAO_per_edge, fr.AO_in_frag)
    moe, C = run_fragment_scf(fr)
    dPs_all = 0.5 * _dPmp2_batch(C, moe, fr.eri, fr.nsocc, vpots)
    return list(dPs_all[:-1]), dPs_all[-1]


def _dPccsd_urlx_batch(C, moe, eri, no, vs):
    """Approximate CCSD (t1-urlx) density response per perturbation.

    Own formulation of the reference's ``get_dPccsdurlx_batch_u``
    (shared/external/jac_utils.py:162): the matched density is
    P = P_HF + [Co t1 Cv^T + h.c.] with the one-cycle t1 from MP2 t2;
    its derivative combines CPHF orbital response, the Fock derivative
    through the t2 denominators, and differentiated integrals.  All
    per-perturbation work is one vmapped jax program.
    """
    import jax

    n = C.shape[0]
    nv = n - no
    C = jnp.asarray(C)
    eri = jnp.asarray(eri)
    moe = jnp.asarray(moe)
    Co, Cv = C[:, :no], C[:, no:]
    eia = moe[:no, None] - moe[None, no:]
    eovov = (
        eia[:, :, None, None] + eia[None, None, :, :]
    )

    def mo4(c1, c2, c3, c4, pattern_unused=None):
        return jnp.einsum(
            "pqrs,pi,qa,rj,sb->iajb", eri, c1, c2, c3, c4, optimize=True
        )

    Vovov = mo4(Co, Cv, Co, Cv)
    Vvovv = jnp.einsum(
        "pqrs,pa,qi,rb,sc->aibc", eri, Cv, Co, Cv, Cv, optimize=True
    )
    Voovo = jnp.einsum(
        "pqrs,pi,qk,rb,sj->ikbj", eri, Co, Co, Cv, Co, optimize=True
    )
    t2 = Vovov / eovov

    def t1_of(Vov_ov, Voovo_, Vvovv_):
        tt = Vov_ov / eovov
        return (
            2.0 * jnp.einsum("ibjc,cjba->ia", tt, Vvovv_, optimize=True)
            - jnp.einsum("jbic,cjba->ia", tt, Vvovv_, optimize=True)
            - 2.0 * jnp.einsum("ikbj,jbka->ia", Voovo_, tt, optimize=True)
            + jnp.einsum("ikbj,kbja->ia", Voovo_, tt, optimize=True)
        ) / eia

    t1 = t1_of(Vovov, Voovo, Vvovv)
    us = cphf_kernel_batch(C, moe, eri, no, vs)

    def one(u, Q):
        uov = u.reshape(no, nv)
        dP_hf = -Co @ uov @ Cv.T
        dP_hf = dP_hf + dP_hf.T
        vj = jnp.einsum("pqrs,rs->pq", eri, 2.0 * dP_hf)
        vk = jnp.einsum("prqs,rs->pq", eri, 2.0 * dP_hf)
        A = -(Q + vj - 0.5 * vk)  # -dF
        Aoo = Co.T @ A @ Co
        Avv = Cv.T @ A @ Cv
        tA = jnp.einsum("lajb,li->iajb", t2, Aoo, optimize=True) - \
            jnp.einsum("idjb,da->iajb", t2, Avv, optimize=True)
        tA = tA + jnp.transpose(tA, (2, 3, 0, 1))

        dCo = -Cv @ uov.T
        dCv = Co @ uov

        def d_mo4(cs, dcs, pattern):
            out = 0.0
            for k in range(4):
                ops = [dcs[k] if j == k else cs[j] for j in range(4)]
                out = out + jnp.einsum(
                    pattern, eri, *ops, optimize=True
                )
            return out

        dVovov = d_mo4(
            (Co, Cv, Co, Cv), (dCo, dCv, dCo, dCv),
            "pqrs,pi,qa,rj,sb->iajb",
        )
        dVvovv = d_mo4(
            (Cv, Co, Cv, Cv), (dCv, dCo, dCv, dCv),
            "pqrs,pa,qi,rb,sc->aibc",
        )
        dVoovo = d_mo4(
            (Co, Co, Cv, Co), (dCo, dCo, dCv, dCo),
            "pqrs,pi,qk,rb,sj->ikbj",
        )

        # t1_of is linear in its first argument and jointly linear in the
        # (Voovo, Vvovv) pair, so the derivative splits into three calls
        dt1_mo = (
            t1_of(tA, Voovo, Vvovv)
            + t1_of(dVovov, Voovo, Vvovv)
            + t1_of(Vovov, dVoovo, dVvovv)
            + (Aoo @ t1 - t1 @ Avv) / eia
        )
        dt1 = Co @ dt1_mo @ Cv.T
        dt1 = dt1 + dCo @ t1 @ Cv.T + Co @ t1 @ dCv.T
        dt1 = dt1 + dt1.T
        dPhf = 2.0 * dCo @ Co.T
        dPhf = dPhf + dPhf.T
        return dt1 + dPhf

    dPs = jax.vmap(one)(jnp.asarray(us), jnp.asarray(np.array(vs)))
    return np.asarray(dPs)


def ccsd_response(fr: Fragment):
    """CP-CCSD(urlx) responses per matching condition (ref optqn.py:452)."""
    vpots = get_vpots_frag(fr.nao, fr.relAO_per_edge, fr.AO_in_frag)
    moe, C = run_fragment_scf(fr)
    dPs_all = 0.5 * _dPccsd_urlx_batch(C, moe, fr.eri, fr.nsocc, vpots)
    return list(dPs_all[:-1]), dPs_all[-1]


def get_atbe_Jblock_frag(fr: Fragment, res_func=hf_response):
    """Per-fragment Jacobian blocks (reference optqn.py:314)."""
    dPs, dP_mu = res_func(fr)

    Je, Jc, y, xe, xc = [], [], [], [], []
    edge_set = {i for sub in fr.relAO_per_edge for i in sub}
    cout = 0
    for edge in fr.relAO_per_edge:
        for j_ in range(len(edge)):
            for k_ in range(j_, len(edge)):
                tmpje = []
                for edge_ in fr.relAO_per_edge:
                    for j in range(len(edge_)):
                        for k in range(j, len(edge_)):
                            tmpje.append(dPs[cout][edge_[j], edge_[k]])
                y_ = sum(
                    dPs[cout][i, i]
                    for i in range(fr.n_frag)
                    if i not in edge_set
                )
                y.append(y_)
                tmpjc = []
                for j in fr.relAO_per_origin:
                    for k in fr.relAO_per_origin:
                        if j > k:
                            continue
                        tmpjc.append(-dPs[cout][j, k])
                Je.append(tmpje)
                Jc.append(tmpjc)
                xe.append(dP_mu[edge[j_], edge[k_]])
                cout += 1

    alpha = sum(
        dP_mu[i, i] for i in range(fr.n_frag) if i not in edge_set
    )
    for j in fr.relAO_per_origin:
        for k in fr.relAO_per_origin:
            if j > k:
                continue
            xc.append(-dP_mu[j, k])

    return (
        np.array(Je).T if Je else np.zeros((0, 0)),
        np.array(Jc).T if Jc else np.zeros((0, 0)),
        xe,
        xc,
        y,
        alpha,
        cout,
    )


def get_be_error_jacobian(fragments: list[Fragment], jac_solver="HF"):
    """Assemble the block Jacobian over all fragments (optqn.py:250)."""
    res_funcs = {"HF": hf_response, "MP2": mp2_response,
                 "CCSD": ccsd_response}
    if jac_solver.upper() not in res_funcs:
        raise NotImplementedError(
            f"jac_solver={jac_solver}; available: {sorted(res_funcs)}"
        )
    res_func = res_funcs[jac_solver.upper()]
    n_frag = len(fragments)
    blocks = [get_atbe_Jblock_frag(fr, res_func) for fr in fragments]
    Jes = [b[0] for b in blocks]
    Jcs = [b[1] for b in blocks]
    xes = [b[2] for b in blocks]
    xcs = [b[3] for b in blocks]
    ys = [b[4] for b in blocks]
    alpha = sum(b[5] for b in blocks)
    Ncout = [b[6] for b in blocks]

    N_ = sum(Ncout)
    J = np.zeros((N_ + 1, N_ + 1))
    cout = 0
    for findx, fr in enumerate(fragments):
        J[cout : Ncout[findx] + cout, cout : Ncout[findx] + cout] = Jes[findx]
        J[cout : Ncout[findx] + cout, N_:] = np.array(xes[findx]).reshape(
            -1, 1
        )
        J[N_:, cout : Ncout[findx] + cout] = ys[findx]
        coutc = 0
        coutc_ = 0
        for cindx, _ in enumerate(fr.relAO_in_ref_per_edge):
            ref = fr.ref_frag_idx_per_edge[cindx]
            coutc += Jcs[ref].shape[0]
            start_ = sum(Ncout[:ref])
            end_ = start_ + Ncout[ref]
            J[cout + coutc_ : cout + coutc, start_:end_] += Jcs[ref]
            J[cout + coutc_ : cout + coutc, N_:] += np.array(
                xcs[ref]
            ).reshape(-1, 1)
            coutc_ = coutc
        cout += Ncout[findx]
    J[N_:, N_:] = alpha
    return J
