"""Relaxed (lambda) CCSD densities via adjoint implicit differentiation.

Validation is exact and self-contained: the Gauss-Stanton energy trace
identity and a finite-difference check of the response 1-RDM."""

import numpy as np

from quemb_tpu.solvers.ccsd_relaxed import ccsd_relaxed_rdms


def _random_system(nmo=8, nsocc=3, seed=5):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((nmo * nmo, nmo * nmo)) * 0.06
    eri = (A @ A.T).reshape(nmo, nmo, nmo, nmo)
    eri = 0.5 * (eri + eri.transpose(1, 0, 2, 3))
    eri = 0.5 * (eri + eri.transpose(0, 1, 3, 2))
    eri = 0.5 * (eri + eri.transpose(2, 3, 0, 1))
    h = rng.standard_normal((nmo, nmo)) * 0.1
    h = 0.5 * (h + h.T) + np.diag(np.arange(nmo) * 1.5 - 4)
    return h, eri, nsocc


def test_energy_trace_identity():
    h, eri, nsocc = _random_system()
    rdm1, rdm2, e = ccsd_relaxed_rdms(h, eri, nsocc)
    e_trace = np.einsum("pq,qp->", h, rdm1) + 0.5 * np.einsum(
        "pqrs,pqrs->", eri, rdm2
    )
    assert abs(e_trace - e) < 1e-10
    assert abs(np.trace(rdm1) - 2 * nsocc) < 1e-9


def test_response_rdm1_finite_difference():
    h, eri, nsocc = _random_system()
    rdm1, _, _ = ccsd_relaxed_rdms(h, eri, nsocc)
    eps = 1e-6
    dh = np.zeros_like(h)
    dh[1, 4] = dh[4, 1] = 1.0
    _, _, ep = ccsd_relaxed_rdms(h + eps * dh, eri, nsocc)
    _, _, em = ccsd_relaxed_rdms(h - eps * dh, eri, nsocc)
    fd = (ep - em) / (2 * eps)
    assert abs(fd - (rdm1[1, 4] + rdm1[4, 1])) < 1e-7


def test_be_relaxed_density_matching():
    """relax_density=True (ref solver.py:920-940) converges and lands a
    few mHa from the unrelaxed result on H8 BE2-CCSD."""
    from quemb_tpu import BE, fragmentate
    from quemb_tpu.chem.mole import Mole
    from quemb_tpu.chem.scf import RHF

    mol = Mole(
        atom="; ".join(f"H 0 0 {i * 1.0}" for i in range(8)),
        basis="sto-3g",
    )
    mf = RHF(mol, conv_tol=1e-12)
    mf.kernel()
    fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen",
                       print_frags=False)
    be1 = BE(mf, fobj)
    be1.optimize(solver="CCSD", relax_density=False)
    be2 = BE(mf, fobj)
    be2.optimize(solver="CCSD", relax_density=True)
    assert np.isfinite(be2.ebe_tot)
    assert abs(be2.ebe_tot - be1.ebe_tot) < 1e-2
