"""Localization methods through the BE pipeline (reference loc_test.py).

The reference pins hexene E_corr values per localizer; here the oracle
is internal and stronger: BE1 puts the whole molecule in one fragment,
so the total energy is exactly invariant under the choice of localized
orbitals (any unitary within the occupied/virtual LO span).  BE2 totals
may differ slightly between localizers but must stay within a few mHa.
"""

import numpy as np
import pytest

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

GEO = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


@pytest.fixture(scope="module")
def water():
    mol = Mole(atom=GEO, basis="6-31g")
    mf = RHF(mol, conv_tol=1e-11)
    mf.kernel()
    fobj = fragmentate(mol=mol, n_BE=1, frag_type="chemgen",
                       print_frags=False)
    return mol, mf, fobj


@pytest.mark.parametrize("lo", ["lowdin", "boys", "PM", "ER"])
def test_be1_localization_invariance(water, lo):
    mol, mf, fobj = water
    be = BE(mf, fobj, lo_method=lo)
    assert abs(be.ebe_hf - mf.e_tot) < 1e-8
    be.oneshot(solver="CCSD")
    e = be.ebe_tot - mf.e_tot
    # full CCSD of water/6-31G, independent of the localizer
    if not hasattr(water[1], "_e_corr_ref"):
        water[1]._e_corr_ref = e
    assert np.isclose(e, water[1]._e_corr_ref, atol=1e-8)
    assert -0.25 < e < -0.05


def test_be1_iao_invariance(water):
    mol, mf, fobj_plain = water
    fobj = fragmentate(mol=mol, n_BE=1, frag_type="chemgen",
                       print_frags=False, iao_valence_basis="sto-3g")
    be = BE(mf, fobj, lo_method="IAO")
    assert abs(be.ebe_hf - mf.e_tot) < 1e-8
    be.oneshot(solver="CCSD")
    be0 = BE(mf, fobj_plain)
    be0.oneshot(solver="CCSD")
    assert np.isclose(be.ebe_tot, be0.ebe_tot, atol=1e-8)


def test_be2_localizers_close():
    mol = Mole(atom="; ".join(f"H 0 0 {i * 0.9}" for i in range(8)),
               basis="sto-3g")
    mf = RHF(mol, conv_tol=1e-11)
    mf.kernel()
    fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen",
                       print_frags=False)
    e = {}
    for lo in ("lowdin", "boys", "PM"):
        be = BE(mf, fobj, lo_method=lo)
        assert abs(be.ebe_hf - mf.e_tot) < 1e-8
        be.oneshot(solver="CCSD")
        e[lo] = be.ebe_tot - mf.e_tot
    for lo in ("boys", "PM"):
        assert abs(e[lo] - e["lowdin"]) < 5e-3, e


def test_be1_iao_loc_method_invariance(water):
    """Jacobi localization within the IAO space (reference lo.py:230
    iao_loc_method) must leave BE1 totals unchanged."""
    mol, mf, _ = water
    fobj = fragmentate(mol=mol, n_BE=1, frag_type="chemgen",
                       print_frags=False, iao_valence_basis="sto-3g")
    es = []
    for m in ("lowdin", "boys", "PM"):
        be = BE(mf, fobj, lo_method="IAO", iao_loc_method=m)
        assert abs(be.ebe_hf - mf.e_tot) < 1e-8
        be.oneshot(solver="CCSD")
        es.append(be.ebe_tot)
    assert np.ptp(es) < 1e-8, es
