"""H8 chain BE integration tests vs reference energies (BASELINE.md).

Mirrors reference tests/molbe_h8_test.py and chempot_molBE_test.py.
"""

import numpy as np
import pytest

from quemb_tpu import BE, ChemGenArgs, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF


@pytest.fixture(scope="module")
def h8():
    mol = Mole(
        atom="\n".join(f"H 0 0 {i}." for i in range(8)), basis="sto-3g"
    )
    mf = RHF(mol, conv_tol=1e-12)
    mf.kernel()
    return mol, mf


def _do_be(mol, mf, n_BE, only_chem, solver="FCI", swallow=False):
    fobj = fragmentate(
        mol=mol,
        n_BE=n_BE,
        frag_type="chemgen",
        additional_args=ChemGenArgs(
            h_treatment="treat_H_like_heavy_atom", swallow_replace=swallow
        ),
        print_frags=False,
    )
    mybe = BE(mf, fobj)
    mybe.optimize(solver=solver, only_chem=only_chem)
    return mybe


def test_hf_in_hf(h8):
    mol, mf = h8
    fobj = fragmentate(
        mol=mol,
        n_BE=2,
        frag_type="chemgen",
        additional_args=ChemGenArgs(h_treatment="treat_H_like_heavy_atom"),
        print_frags=False,
    )
    mybe = BE(mf, fobj)
    assert abs(mybe.ebe_hf - mf.e_tot) < 1e-9


def test_be_density_matching(h8):
    mol, mf = h8
    BE2 = _do_be(mol, mf, 2, only_chem=False)
    assert np.isclose(BE2.ebe_tot - BE2.ebe_hf, -0.1343036698277933)

    with pytest.raises(ValueError):
        _do_be(mol, mf, 3, only_chem=False, swallow=False)

    BE3 = _do_be(mol, mf, 3, only_chem=False, swallow=True)
    assert np.isclose(BE3.ebe_tot - BE3.ebe_hf, -0.1332017928466369)


def test_be_chemical_potential(h8):
    mol, mf = h8
    BE1 = _do_be(mol, mf, 1, only_chem=True)
    assert np.isclose(BE1.ebe_tot - BE1.ebe_hf, -0.12831444938462155)

    BE2 = _do_be(mol, mf, 2, only_chem=True)
    assert np.isclose(BE2.ebe_tot - BE2.ebe_hf, -0.1343968038684169)

    BE3 = _do_be(mol, mf, 3, only_chem=True)
    assert np.isclose(BE3.ebe_tot - BE3.ebe_hf, -0.1332017928466369)


def test_be_chempot_ccsd(h8):
    """Reference chempot_molBE_test.py targets (delta=1e-4)."""
    mol, mf = h8
    BE2 = _do_be(mol, mf, 2, only_chem=True, solver="CCSD")
    assert abs(BE2.ebe_tot - (-4.30628355)) < 1e-4
    BE3 = _do_be(mol, mf, 3, only_chem=True, solver="CCSD")
    assert abs(BE3.ebe_tot - (-4.30649890)) < 1e-4


def test_be1_density_matching_raises(h8):
    mol, mf = h8
    with pytest.raises(ValueError):
        _do_be(mol, mf, 1, only_chem=False)


def test_incore_cd_route_matches_exact(h8, monkeypatch):
    """The accelerator in-core path (pivoted-CD factor + device
    transform, api.py _incore_via_cd) must reproduce the exact host
    quarter-transform BE2 fixed point: the CD tolerance bounds every ERI
    element at 1e-10, so the matched energies agree far below it."""
    mol, mf = h8
    monkeypatch.setenv("QUEMB_TPU_INCORE_CD", "1")
    BE2_cd = _do_be(mol, mf, 2, only_chem=False)
    import jax

    # the route really ran: fragment ERIs are device arrays
    assert isinstance(BE2_cd.fragments[0].eri, jax.Array)
    monkeypatch.setenv("QUEMB_TPU_INCORE_CD", "0")
    BE2 = _do_be(mol, mf, 2, only_chem=False)
    assert abs(BE2_cd.ebe_tot - BE2.ebe_tot) < 1e-8
    assert np.isclose(
        BE2_cd.ebe_tot - BE2_cd.ebe_hf, -0.1343036698277933
    )
