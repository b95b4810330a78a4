"""Tabulated-basis correctness and external-MF (ORCA) ingestion.

cc-pVDZ C/H are the published tables (validated against literature RHF
anchors: H2 -1.128711, CH4 -40.1987); O/N/F are regenerated with the
published construction (state-specific atomic ROHF; see
quemb_tpu/chem/basis_data.py and .scripts/refit_ccpvdz.py).  The ORCA
ingestion consumes the basis EMBEDDED in the JSON property file, so the
parsed mean field is usable end-to-end without external tables
(reference mf_interfaces/orca_interface.py reaches the same point
through PySCF's tables).
"""

import os

import numpy as np
import pytest

from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

from conftest import DATA_DIR

EXPENSIVE = os.getenv("QUEMB_TPU_EXPENSIVE_TESTS") == "true"
ORCA_JSON = os.path.join(DATA_DIR, "h2o_cc-pvqz_orca.json")


def test_ccpvdz_h2_literature_anchor():
    mol = Mole(atom="H 0 0 0; H 0 0 0.741", basis="cc-pvdz", cart=False)
    mf = RHF(mol, conv_tol=1e-11)
    mf.kernel()
    # literature HF/cc-pVDZ for H2 at 0.741 A
    assert abs(mf.e_tot - (-1.1287110109)) < 1e-7


def test_def2svp_h2o_literature_anchor():
    geom = """O 0.000000 0.000000 0.117790
    H 0.000000 0.755453 -0.471161
    H 0.000000 -0.755453 -0.471161"""
    mol = Mole(atom=geom, basis="def2-svp", cart=False)
    assert mol.nao == 24
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    # literature HF/def2-SVP for water (~-75.9607); measured -75.960970
    assert abs(mf.e_tot - (-75.96096990)) < 2e-4


@pytest.mark.skipif(not EXPENSIVE, reason="expensive: cc-pVDZ water RHF")
def test_ccpvdz_h2o_literature_anchor():
    geom = """O 0.000000 0.000000 0.117790
    H 0.000000 0.755453 -0.471161
    H 0.000000 -0.755453 -0.471161"""
    mol = Mole(atom=geom, basis="cc-pvdz", cart=False)
    assert mol.nao == 24
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    # literature ~-76.02680; the regenerated O table lands at -76.026765
    assert abs(mf.e_tot - (-76.02680)) < 1e-4


def test_orca_json_mole_and_orthonormality():
    """The Mole built from the ORCA-embedded cc-pVQZ basis (up to g
    functions) reproduces ORCA's overlap: parsed MOs are S-orthonormal
    through the own general-L integral engine."""
    from quemb_tpu.chem.integrals import overlap
    from quemb_tpu.mf_interfaces import load_orca_json, mole_from_orca_json

    mol = mole_from_orca_json(ORCA_JSON)
    assert mol.nao == 115
    assert max(sh.l for sh in mol.shells) == 4  # g functions on O
    S = overlap(mol)
    C = load_orca_json(ORCA_JSON)["mo_coeff"]
    err = np.abs(C.T @ S @ C - np.eye(C.shape[1])).max()
    assert err < 1e-6  # JSON stores ~8 significant digits


@pytest.mark.skipif(not EXPENSIVE, reason="expensive: cc-pVQZ ERI build")
def test_orca_end_to_end_energy():
    """Full external-MF consumption: the HF energy rederived from the
    parsed ORCA density with own integrals equals the variational
    minimum of the own SCF on the same embedded basis (measured both at
    -76.0637071, agreement 7e-9)."""
    from quemb_tpu.mf_interfaces import mf_from_orca_json

    mol, mf = mf_from_orca_json(ORCA_JSON, with_energy=True)
    assert abs(mf.e_tot - (-76.06370708)) < 1e-6
    # Fock diagonal in the parsed MO basis reproduces ORCA's printed
    # orbital energies (validates hcore + ERIs through l=4)
    dm = mf.make_rdm1()
    F = mf.get_hcore() + mf.get_veff(dm)
    eps = np.diag(mf.mo_coeff.T @ F @ mf.mo_coeff)
    assert np.abs(eps[:20] - mf.mo_energy[:20]).max() < 1e-5


def test_631g_second_row_tables():
    """6-31G F-Ne + Na-Ar tables (validated by .scripts/validate_631g.py:
    atomic-UHF-optimum distance within the published-table control band;
    F/Ne/S/Ar are own-optimized where recalled candidates failed).
    Molecular pins are this stack's own converged values; loose anchors
    against literature HF/6-31G are in the docstring of each line."""
    from quemb_tpu.chem.basis_data import _631G

    for el in ("F", "Ne", "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar"):
        assert el in _631G
    # H2S (r_SH 1.328 A-equivalent geometry): literature HF/6-31G ~ -398.63
    mol = Mole(
        atom=[("S", [0.0, 0.0, 0.1030]), ("H", [0.0, 0.9616, -0.8239]),
              ("H", [0.0, -0.9616, -0.8239])],
        basis="6-31g", unit="angstrom")
    assert mol.nao == 17
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    assert abs(mf.e_tot - (-398.62754043)) < 1e-6
    # SiH4 tetrahedral r=1.480 A: literature HF/6-31G ~ -291.17
    r = 1.480 / np.sqrt(3.0)
    mol2 = Mole(
        atom=[("Si", [0, 0, 0])]
        + [("H", [s1 * r, s2 * r, s3 * r])
           for s1, s2, s3 in [(1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)]],
        basis="6-31g", unit="angstrom")
    mf2 = RHF(mol2, conv_tol=1e-10)
    mf2.kernel()
    assert abs(mf2.e_tot - (-291.17373042)) < 1e-6


def test_ccpvdz_second_row_tables():
    """cc-pVDZ Ne + Na-Ar (own Dunning-construction tables,
    .scripts/refit_ccpvdz_row2.py).  Approximate provenance: correct
    construction, own-optimized primitive ladders — atomic HF sits
    ~1.5 mHa above the published-basis value for Ne, molecular RHF within
    ~10 mHa of literature (HCl lit ~-460.0937, measured -460.0842).
    Pins are this stack's own converged values; the loose literature
    anchor guards against table corruption, closing SURVEY-era missing
    item 'basis-table breadth' (reference delegates to PySCF tables)."""
    from quemb_tpu.chem.basis_data import _CCPVDZ

    for el in ("Ne", "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar"):
        assert el in _CCPVDZ
    mol = Mole(atom=[("Ne", [0.0, 0.0, 0.0])], basis="cc-pvdz", cart=False)
    assert mol.nao == 14
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    assert abs(mf.e_tot - (-128.48730838)) < 1e-6  # published -128.48877
    mol2 = Mole(atom="H 0 0 0; Cl 0 0 1.2746", basis="cc-pvdz", cart=False)
    assert mol2.nao == 23
    mf2 = RHF(mol2, conv_tol=1e-10)
    mf2.kernel()
    assert abs(mf2.e_tot - (-460.08415099)) < 1e-6  # lit ~-460.0937
    assert abs(mf2.e_tot - (-460.0937)) < 0.02


def test_631g_star_polarization_second_row():
    """6-31G* adds one cartesian 6d shell on heavies (Francl et al. 1982
    second-row exponents); energy must drop below plain 6-31G."""
    mol = Mole(
        atom=[("S", [0.0, 0.0, 0.1030]), ("H", [0.0, 0.9616, -0.8239]),
              ("H", [0.0, -0.9616, -0.8239])],
        basis="6-31g*", unit="angstrom")
    assert mol.nao == 17 + 6
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    assert mf.e_tot < -398.62754043 - 0.03  # d shell gains >30 mHa on S
