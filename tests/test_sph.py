"""Spherical-harmonic AO mode (Mole(cart=False)).

The engine stays cartesian internally; the public integrals are
transformed by the block c2s matrix (chem/sph.py).  Oracles are
internal: exactness of the pure-l subspace, and the cartesian engine
itself evaluated on spherically-mapped MOs.
"""

import numpy as np
import pytest

from quemb_tpu.chem import integrals
from quemb_tpu.chem.mole import Mole, cart_components
from quemb_tpu.chem.scf import RHF
from quemb_tpu.chem.sph import _cart_shell_overlap, c2s_matrix

GEO = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_c2s_orthonormal_and_pure():
    """Rows are S-orthonormal and S-orthogonal to every r^2-contaminant."""
    for l in (2, 3, 4):
        T = c2s_matrix(l)
        S = _cart_shell_overlap(l)
        assert np.abs(T @ S @ T.T - np.eye(2 * l + 1)).max() < 1e-13
        comps = cart_components(l)
        pos = {c: i for i, c in enumerate(comps)}
        for m in cart_components(l - 2):
            v = np.zeros(len(comps))
            for d in range(3):
                mm = list(m)
                mm[d] += 2
                v[pos[tuple(mm)]] += 1.0
            assert np.abs(T @ S @ v).max() < 1e-13


def test_water_631gstar_sph_rhf():
    mc = Mole(atom=GEO, basis="6-31g*")
    ms = Mole(atom=GEO, basis="6-31g*", cart=False)
    assert (mc.nao, ms.nao) == (19, 18)
    mfc = RHF(mc, conv_tol=1e-11)
    ec = mfc.kernel()
    mfs = RHF(ms, conv_tol=1e-11)
    es = mfs.kernel()
    # spherical span is a subspace of the cartesian span -> variational
    assert es >= ec - 1e-10
    assert es - ec < 5e-3
    # oracle: map sph MOs back to cartesian AOs and re-evaluate the HF
    # energy with the UNtransformed cartesian engine
    C_cart = ms.c2s.T @ mfs.mo_coeff
    nocc = ms.nelectron // 2
    dm = 2.0 * C_cart[:, :nocc] @ C_cart[:, :nocc].T
    h = integrals.core_hamiltonian(mc)
    eri = integrals.eri_full(mc)
    J = np.einsum("pqrs,rs->pq", eri, dm)
    K = np.einsum("prqs,rs->pq", eri, dm)
    e_re = np.einsum("pq,pq->", h + 0.5 * (J - 0.5 * K), dm) + mc.energy_nuc()
    assert abs(e_re - es) < 1e-9


def test_sph_be_oneshot_and_df():
    from quemb_tpu import BE, fragmentate
    from quemb_tpu.ops.df import StreamedDF, make_even_tempered_auxbasis
    from quemb_tpu.ops.screening import approx_S_abs

    ms = Mole(atom=GEO, basis="6-31g*", cart=False)
    mf = RHF(ms, conv_tol=1e-11)
    mf.kernel()
    fobj = fragmentate(mol=ms, n_BE=1, frag_type="chemgen", print_frags=False)
    be = BE(mf, fobj)
    assert abs(be.ebe_hf - mf.e_tot) < 1e-8  # HF-in-HF invariant
    # single fragment -> BE1-CCSD == full CCSD; the spherical E_corr must
    # sit close to the cartesian one (d-contaminant effect is small)
    be.oneshot(solver="CCSD")
    e_corr_sph = be.ebe_tot - mf.e_tot
    mc = Mole(atom=GEO, basis="6-31g*")
    mfc = RHF(mc, conv_tol=1e-11)
    mfc.kernel()
    bec = BE(mfc, fragmentate(mol=mc, n_BE=1, frag_type="chemgen",
                              print_frags=False))
    bec.oneshot(solver="CCSD")
    e_corr_cart = bec.ebe_tot - mfc.e_tot
    assert -0.35 < e_corr_sph < -0.1
    assert abs(e_corr_sph - e_corr_cart) < 5e-3

    # streamed DF in spherical mode vs exact transformed ERI
    TA = np.linalg.qr(np.random.default_rng(0).normal(size=(ms.nao, 6)))[0]
    sdf = StreamedDF(ms, max_memory_gb=1e-4)  # force multiple blocks
    eri_df = sdf.fragment_eri(TA)
    eri = integrals.eri_full(ms)
    eri_ex = np.einsum(
        "pqrs,pi,qj,rk,sl->ijkl", eri, TA, TA, TA, TA, optimize=True
    )
    assert np.abs(eri_df - eri_ex).max() < 5e-4  # ETB aux fit quality

    # absolute-overlap bound still valid after the |T| sandwich
    S_abs = approx_S_abs(ms)
    S = integrals.overlap(ms)
    d = np.sqrt(np.abs(np.diag(S)))
    assert (S_abs + 1e-10 >= np.abs(S) / d[:, None] / d[None, :]).all()


def test_sph_be_int_direct_df():
    """Spherical mode composed with the DF integral transform."""
    from quemb_tpu import BE, fragmentate

    ms = Mole(atom=GEO, basis="6-31g*", cart=False)
    mf = RHF(ms, conv_tol=1e-11)
    mf.kernel()
    fobj = fragmentate(mol=ms, n_BE=1, frag_type="chemgen",
                       print_frags=False)
    be = BE(mf, fobj, int_transform="int-direct-DF")
    assert abs(be.ebe_hf - mf.e_tot) < 1e-8
    be.oneshot(solver="CCSD")
    # exact-ERI value is -0.19523506 (test above); ETB-DF fit ~4e-7 off
    assert abs((be.ebe_tot - mf.e_tot) - (-0.1952351)) < 5e-5
