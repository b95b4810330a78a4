"""AO integrals + RHF vs textbook / reference values."""

import numpy as np

from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF


def test_h2_sto3g():
    mol = Mole(atom="H 0 0 0; H 0 0 0.74086", basis="sto-3g")
    mf = RHF(mol)
    S = mf.get_ovlp()
    assert np.isclose(S[0, 1], 0.6593, atol=2e-4)
    e = mf.kernel()
    assert mf.converged
    assert np.isclose(e, -1.1167136849, atol=1e-8)


def test_water_sto3g():
    mol = Mole(
        atom="O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g",
    )
    e = RHF(mol).kernel()
    assert np.isclose(e, -74.963023, atol=2e-5)


def test_water_631g():
    mol = Mole(
        atom="O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="6-31g",
    )
    e = RHF(mol).kernel()
    assert np.isclose(e, -75.983974, atol=2e-5)


def test_eri_symmetry():
    mol = Mole(atom="O 0 0 0.1; H 0 0.75 -0.45; H 0 -0.7 -0.46", basis="sto-3g")
    eri = RHF(mol).get_eri()
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3))
    assert np.allclose(eri, eri.transpose(0, 1, 3, 2))
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1))


def test_charged_species():
    # H3+ closed shell
    mol = Mole(
        atom="H 0 0 0; H 0 0 0.9; H 0.45 0.779 0", basis="sto-3g", charge=1
    )
    mf = RHF(mol)
    e = mf.kernel()
    assert mf.converged and e < -1.0
