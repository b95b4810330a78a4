"""Per-objective-evaluation fragment solve pass + error vector.

TPU-native replacement for the reference's ``molbe/solver.py:be_func`` and
``be_parallel.py``: fragments are bucketed by embedding-space signature
(nemb, nsocc) and each bucket runs as ONE batched device program
(vmapped SCF -> vmapped MO transform -> vmapped CCSD -> batched energy
contraction) instead of a forked process pool.  FCI fragments run through
the host Davidson solver.
"""

from __future__ import annotations

import numpy as np

import jax
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


# ------------------------------------------------- batched bucket pipeline
@jax.jit
def _batched_mo_eri(eri_b, C_b):
    return jax.vmap(
        lambda eri, C: jnp.einsum(
            "pqrs,pi,qj,rk,sl->ijkl", eri, C, C, C, C
        )
    )(eri_b, C_b)


@jax.jit
def _batched_energy_rows(mo_b, h1_b, veff0_b, eri_b, rdm1_b, rdm2_b,
                         occ_mask_b, center_w_b):
    """Cumulant fragment energies for a bucket.

    center_w_b: [nf, nemb] weight per embedding row (w on center rows,
    0 elsewhere).  Returns (e1, e2, ec) per fragment.
    """

    def one(mo, h1, veff0, eri, rdm1, rdm2, occ_mask, w):
        rdm1_emb = mo @ (0.5 * rdm1) @ mo.T
        hf_1rdm = (mo * occ_mask[None, :]) @ mo.T
        delta = 2.0 * (rdm1_emb - hf_1rdm)
        e1 = jnp.einsum("ij,ij->i", h1, delta)
        ec = jnp.einsum("ij,ij->i", veff0, delta)
        rdm2_emb = jnp.einsum(
            "ijkl,pi,qj,rk,sl->pqrs", 0.5 * rdm2, mo, mo, mo, mo
        )
        e2 = jnp.einsum("ijkl,ijkl->i", rdm2_emb, eri)
        return w @ e1, w @ e2, w @ ec

    return jax.vmap(one)(
        mo_b, h1_b, veff0_b, eri_b, rdm1_b, rdm2_b, occ_mask_b, center_w_b
    )


@jax.jit
def _batched_energy_rows_nc(mo_b, h1_b, veff_b, eri_b, rdm1_b, rdm2_b,
                            center_w_b):
    """Non-cumulant fragment energies for a bucket (ref helper.py:295):
    full 1-RDM against h1/veff(env), full 2-RDM against the ERI."""

    def one(mo, h1, veff, eri, rdm1, rdm2, w):
        rdm1_emb = mo @ (0.5 * rdm1) @ mo.T
        e1 = 2.0 * jnp.einsum("ij,ij->i", h1, rdm1_emb)
        ec = jnp.einsum("ij,ij->i", veff, rdm1_emb)
        rdm2_emb = jnp.einsum(
            "ijkl,pi,qj,rk,sl->pqrs", 0.5 * rdm2, mo, mo, mo, mo
        )
        e2 = jnp.einsum("ijkl,ijkl->i", rdm2_emb, eri)
        return w @ e1, w @ e2, w @ ec

    return jax.vmap(one)(
        mo_b, h1_b, veff_b, eri_b, rdm1_b, rdm2_b, center_w_b
    )


@jax.jit
def _batched_rdm1_emb(C_b, rdm1_b):
    return jax.vmap(lambda C, d: (C @ d @ C.T) * 0.5)(C_b, rdm1_b)


def _make_rdm_batched_ccsd(t1_b, t2_b, nmo, with_dm1):
    """Batched urlx RDMs from batched amplitudes (host assembly)."""
    from quemb_tpu.solvers.ccsd import make_rdm1_ccsd_t1, make_rdm2_urlx

    rdm1 = np.stack([make_rdm1_ccsd_t1(t1) for t1 in t1_b])
    rdm2 = np.stack(
        [
            make_rdm2_urlx(t1, t2, with_dm1=with_dm1)
            for t1, t2 in zip(t1_b, t2_b)
        ]
    )
    return rdm1, rdm2


def _solve_bucket_batched(
    frs: list[Fragment],
    solver: str,
    eeval: bool,
    use_cumulant: bool,
    relax_density: bool,
):
    """Solve a bucket of same-shaped fragments as batched device programs."""
    from quemb_tpu.parallel.mesh import shard_batch

    nsocc = frs[0].nsocc
    nemb = frs[0].nao
    nf_true = len(frs)
    h_b, _ = shard_batch(np.stack([fr.fock + fr.heff for fr in frs]))
    eri_b, _ = shard_batch(np.stack([fr.eri for fr in frs]))
    dm0_b, _ = shard_batch(np.stack([fr.dm0 for fr in frs]))

    moe_b, C_b, _, _ = jax.vmap(
        lambda h, eri, dm0: rhf_orthonormal(h, eri, nsocc, dm0)
    )(h_b, eri_b, dm0_b)
    eri_mo_b = _batched_mo_eri(eri_b, C_b)

    if solver == "CCSD" and relax_density:
        # lambda/response densities via adjoint implicit differentiation
        # (reference solver.py:920-940 relax=True -> pyscf make_rdm1/2
        # with Lambda amplitudes)
        from quemb_tpu.solvers.ccsd_relaxed import ccsd_relaxed_rdms

        h_mo_b = jax.vmap(lambda C, h: C.T @ h @ C)(C_b, h_b)
        rdm1_l, rdm2_l = [], []
        for h_mo, eri_mo in zip(np.asarray(h_mo_b)[:nf_true],
                                np.asarray(eri_mo_b)[:nf_true]):
            rdm1, rdm2, _ = ccsd_relaxed_rdms(h_mo, eri_mo, nsocc)
            if use_cumulant:
                rdm2 = remove_mf_part(rdm1, rdm2, nsocc)
            rdm1_l.append(rdm1)
            rdm2_l.append(rdm2)
        rdm1_b, rdm2_b = np.stack(rdm1_l), np.stack(rdm2_l)
    elif solver == "CCSD":
        from quemb_tpu.solvers.ccsd import ccsd_so_batched

        # HBM-aware vmap width: per-lane footprint is dominated by the
        # DIIS amplitude/error history + while-loop double buffering +
        # the fused blocks (all ~ no^2*nv^2 doubles).  0 = full batch.
        import os as _os

        env = _os.environ.get("QUEMB_TPU_CCSD_LANES", "")
        if env:
            max_lanes = int(env)
        elif jax.default_backend() == "cpu":
            max_lanes = 0
        else:
            n2 = (2 * nsocc) ** 2 * (2 * (nemb - nsocc)) ** 2
            per_lane = 8 * n2 * 50  # empirical copies of T2p incl. carry
            max_lanes = max(1, int(12e9 / max(per_lane, 1)))
        eri_mo_np = np.asarray(eri_mo_b)[:nf_true]
        moe_np = np.asarray(moe_b)[:nf_true]
        if max_lanes and nf_true > max_lanes:
            t1_parts, t2_parts, deltas = [], [], []
            for s in range(0, nf_true, max_lanes):
                t1_c, t2_c, _, d_c = ccsd_so_batched(
                    eri_mo_np[s : s + max_lanes],
                    moe_np[s : s + max_lanes],
                    nsocc,
                )
                t1_parts.append(np.asarray(t1_c))
                t2_parts.append(np.asarray(t2_c))
                deltas.append(np.asarray(d_c))
            t1_b = np.concatenate(t1_parts)
            t2_b = np.concatenate(t2_parts)
            delta = np.concatenate(deltas)
        else:
            t1_b, t2_b, n_it, delta = ccsd_so_batched(
                eri_mo_np, moe_np, nsocc
            )
            t1_b = np.asarray(t1_b)[:nf_true]
            t2_b = np.asarray(t2_b)[:nf_true]
        if float(np.max(np.asarray(delta))) > 1e-7:
            import warnings

            warnings.warn(
                f"CCSD bucket not fully converged: "
                f"max|dt| = {float(np.max(np.asarray(delta))):.2e}"
            )
        rdm1_b, rdm2_b = _make_rdm_batched_ccsd(
            t1_b, t2_b, nemb, with_dm1=not use_cumulant
        )
        for fr, t1, t2 in zip(frs, t1_b, t2_b):
            fr.t1, fr.t2 = t1, t2
    elif solver == "MP2":
        from quemb_tpu.solvers.mp2 import make_rdm1_mp2, make_rdm2_mp2, \
            mp2_amplitudes

        rdm1_l, rdm2_l = [], []
        for eri_mo, moe in zip(np.asarray(eri_mo_b)[:nf_true],
                               np.asarray(moe_b)[:nf_true]):
            t2, _ = mp2_amplitudes(eri_mo, moe, nsocc)
            rdm1_l.append(make_rdm1_mp2(t2, nemb))
            rdm2_l.append(make_rdm2_mp2(t2, nemb))
        rdm1_b, rdm2_b = np.stack(rdm1_l), np.stack(rdm2_l)
    elif solver == "FCI":
        rdm1_l, rdm2_l = [], []
        h_mo_b = jax.vmap(lambda C, h: C.T @ h @ C)(C_b, h_b)
        for h_mo, eri_mo in zip(np.asarray(h_mo_b)[:nf_true],
                                np.asarray(eri_mo_b)[:nf_true]):
            _, rdm1, rdm2 = solve_fci(h_mo, eri_mo, nsocc)
            if eeval and use_cumulant:
                rdm2 = remove_mf_part(rdm1, rdm2, nsocc)
            rdm1_l.append(rdm1)
            rdm2_l.append(rdm2)
        rdm1_b, rdm2_b = np.stack(rdm1_l), np.stack(rdm2_l)
    elif solver in ("DMRG", "SHCI", "HCI"):
        # Reference enum parity (molbe/solver.py:42 Solvers literal).
        # DMRG needs block2, SHCI needs cornell_shci -- external C++
        # packages the reference shells out to (solver.py:949,:346) and
        # that are not TPU-portable; HCI raises upstream as well.
        raise NotImplementedError(
            f"Solver {solver!r} requires an external package (block2 /"
            " cornell_shci) that is not available; the reference gates"
            " these behind optional dependencies too."
        )
    elif solver == "SCI":
        from quemb_tpu.solvers.sci import solve_sci

        rdm1_l, rdm2_l = [], []
        h_mo_b = jax.vmap(lambda C, h: C.T @ h @ C)(C_b, h_b)
        for h_mo, eri_mo in zip(np.asarray(h_mo_b)[:nf_true],
                                np.asarray(eri_mo_b)[:nf_true]):
            _, rdm1, rdm2 = solve_sci(h_mo, eri_mo, nsocc)
            if eeval and use_cumulant:
                rdm2 = remove_mf_part(rdm1, rdm2, nsocc)
            rdm1_l.append(rdm1)
            rdm2_l.append(rdm2)
        rdm1_b, rdm2_b = np.stack(rdm1_l), np.stack(rdm2_l)
    else:
        raise NotImplementedError(f"Solver {solver} not implemented")

    # correlated 1-RDM in the embedding basis (for the error vector)
    C_np = np.asarray(C_b)[:nf_true]
    _rdm1_b = np.asarray(
        _batched_rdm1_emb(jnp.asarray(C_np), jnp.asarray(rdm1_b))
    )
    for fr, C, moe, _rdm1, rdm1 in zip(
        frs, C_np, np.asarray(moe_b)[:nf_true], _rdm1_b, rdm1_b
    ):
        fr.mo_coeffs, fr.mo_energy = C, moe
        fr._rdm1 = _rdm1
        fr.rdm1__ = rdm1

    if not eeval:
        return None

    for fr, rdm2 in zip(frs, rdm2_b):
        fr.rdm2__ = rdm2

    occ_mask = np.zeros((len(frs), nemb))
    occ_mask[:, :nsocc] = 1.0
    center_w = np.zeros((len(frs), nemb))
    for i, fr in enumerate(frs):
        w, idx = fr.weight_and_relAO_per_center
        center_w[i, list(idx)] = w
    h1_b = jnp.asarray(np.stack([fr.h1 for fr in frs]))
    eri_true_b = jnp.asarray(np.stack([fr.eri for fr in frs]))
    if use_cumulant:
        veff0_b = jnp.asarray(np.stack([fr.veff0 for fr in frs]))
        e1, e2, ec = _batched_energy_rows(
            jnp.asarray(C_np), h1_b, veff0_b, eri_true_b,
            jnp.asarray(rdm1_b), jnp.asarray(rdm2_b),
            jnp.asarray(occ_mask), jnp.asarray(center_w),
        )
    else:
        veff_b = jnp.asarray(np.stack([fr.veff for fr in frs]))
        e1, e2, ec = _batched_energy_rows_nc(
            jnp.asarray(C_np), h1_b, veff_b, eri_true_b,
            jnp.asarray(rdm1_b), jnp.asarray(rdm2_b),
            jnp.asarray(center_w),
        )
    for fr, a, b, c in zip(frs, np.asarray(e1), np.asarray(e2),
                           np.asarray(ec)):
        fr.ebe = float(a + b + c)
    return [
        float(np.asarray(e1).sum()),
        float(np.asarray(e2).sum()),
        float(np.asarray(ec).sum()),
    ]


def solve_one_fragment(
    fr: Fragment,
    solver: str,
    eeval: bool,
    use_cumulant: bool = True,
    relax_density: bool = False,
):
    """Single-fragment solve (kept for probing/tests); updates fr in place."""
    res = _solve_bucket_batched([fr], solver, eeval, use_cumulant,
                                relax_density)
    if eeval:
        return res
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
    for fr in fragments:
        if pot is not None:
            fr.update_heff(pot, only_chem=only_chem)

    buckets: dict[tuple[int, int], list[Fragment]] = {}
    for fr in fragments:
        buckets.setdefault((fr.nao, fr.nsocc), []).append(fr)

    total_e = [0.0, 0.0, 0.0]
    for frs in buckets.values():
        e_b = _solve_bucket_batched(
            frs, solver, eeval, use_cumulant, relax_density
        )
        if eeval:
            total_e = [a + b for a, b in zip(total_e, e_b)]

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
