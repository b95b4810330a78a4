"""Per-objective-evaluation fragment solve loop + error vector.

TPU-native replacement for the reference's ``molbe/solver.py:be_func`` and
``be_parallel.py``: instead of forked process pools, every fragment solve is
jitted jax compute; fragments sharing an embedding-space signature compile
once and can be vmapped/shard_mapped across devices.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from quemb_tpu.embed.energy import fragment_energy
from quemb_tpu.embed.fragment import Fragment
from quemb_tpu.embed.fragment_scf import rhf_orthonormal
from quemb_tpu.solvers.fci import remove_mf_part, solve_fci


def _mo_transform(C, h, eri):
    C = jnp.asarray(C)
    h_mo = C.T @ jnp.asarray(h) @ C
    eri_mo = jnp.einsum(
        "pqrs,pi,qj,rk,sl->ijkl", jnp.asarray(eri), C, C, C, C
    )
    return np.asarray(h_mo), np.asarray(eri_mo)


def run_fragment_scf(fr: Fragment, heff=None):
    """Fragment RHF on (fock + heff, eri) from the initial density guess."""
    h = fr.fock + (fr.heff if heff is None else heff)
    e, C, e_el, n_it = rhf_orthonormal(
        jnp.asarray(h), jnp.asarray(fr.eri), fr.nsocc, jnp.asarray(fr.dm0)
    )
    return np.asarray(e), np.asarray(C)


def solve_one_fragment(
    fr: Fragment,
    solver: str,
    eeval: bool,
    use_cumulant: bool = True,
    relax_density: bool = False,
):
    """SCF + high-level solve of one fragment; updates fr state in place.

    Returns the energy triple [e1, e2, ec] if ``eeval`` else None.
    """
    moe, C = run_fragment_scf(fr)
    fr.mo_energy, fr.mo_coeffs = moe, C

    if solver == "FCI":
        h_mo, eri_mo = _mo_transform(C, fr.fock + fr.heff, fr.eri)
        _, rdm1, rdm2 = solve_fci(h_mo, eri_mo, fr.nsocc)
        if eeval and use_cumulant:
            rdm2c = remove_mf_part(rdm1, rdm2, fr.nsocc)
        else:
            rdm2c = rdm2
    elif solver == "CCSD":
        from quemb_tpu.solvers.ccsd import solve_ccsd  # noqa: PLC0415

        rdm1, rdm2c = solve_ccsd(
            fr, C, moe, with_dm2=eeval, use_cumulant=use_cumulant,
            relax=relax_density,
        )
    elif solver == "MP2":
        from quemb_tpu.solvers.mp2 import solve_mp2  # noqa: PLC0415

        rdm1, rdm2c = solve_mp2(fr, C, moe, with_dm2=eeval,
                                use_cumulant=use_cumulant)
    else:
        raise NotImplementedError(f"Solver {solver} not implemented")

    fr.rdm1__ = rdm1.copy()
    fr._rdm1 = (C @ rdm1 @ C.T) * 0.5

    if eeval:
        fr.rdm2__ = rdm2c.copy()
        return fragment_energy(fr, rdm1, rdm2c, use_cumulant=use_cumulant)
    return None


def be_func(
    pot,
    fragments: list[Fragment],
    Nocc: int,
    solver: str,
    only_chem: bool = False,
    eeval: bool = False,
    return_vec: bool = False,
    use_cumulant: bool = True,
    relax_density: bool = False,
):
    """Solve all fragments; return error norm / vector / energies.

    Same return contract as reference ``molbe/solver.py:be_func``.
    """
    total_e = [0.0, 0.0, 0.0]
    for fr in fragments:
        if pot is not None:
            fr.update_heff(pot, only_chem=only_chem)
        e_f = solve_one_fragment(
            fr, solver, eeval, use_cumulant, relax_density
        )
        if eeval:
            total_e = [a + b for a, b in zip(total_e, e_f)]

    Ecorr = sum(total_e)
    if eeval and not return_vec:
        return (Ecorr, total_e)
    ernorm, ervec = solve_error(fragments, Nocc, only_chem=only_chem)
    if eeval:
        return (ernorm, ervec, [Ecorr, total_e])
    if return_vec:
        return (ernorm, ervec, None)
    return ernorm


def solve_error(fragments: list[Fragment], Nocc, only_chem: bool = False):
    """Edge-center 1-RDM matching error vector (reference solver.py:683)."""
    err_chempot = 0.0
    if only_chem:
        for fr in fragments:
            for i in fr.weight_and_relAO_per_center[1]:
                err_chempot += fr._rdm1[i, i]
        err_chempot /= fragments[0].unitcell_nkpt
        err = err_chempot - Nocc
        return abs(err), np.asarray([err])

    err_edge = []
    for fr in fragments:
        for edge in fr.relAO_per_edge:
            for j in range(len(edge)):
                for k in range(j, len(edge)):
                    err_edge.append(fr._rdm1[edge[j], edge[k]])
        for i in fr.weight_and_relAO_per_center[1]:
            err_chempot += fr._rdm1[i, i]
    err_chempot /= fragments[0].unitcell_nkpt
    err_edge.append(err_chempot)

    err_cen = []
    for fr in fragments:
        for cidx, cens in enumerate(fr.relAO_in_ref_per_edge):
            ref = fragments[fr.ref_frag_idx_per_edge[cidx]]
            for j in range(len(cens)):
                for k in range(j, len(cens)):
                    err_cen.append(ref._rdm1[cens[j], cens[k]])
    err_cen.append(Nocc)

    err_vec = np.asarray(err_edge) - np.asarray(err_cen)
    norm_ = float(np.mean(err_vec * err_vec) ** 0.5)
    return norm_, err_vec
