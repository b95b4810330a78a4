"""d-shell (polarization) basis support: 6-31G*/6-31G** (cartesian 6d).

The general-L McMurchie-Davidson engine needs no changes for d shells;
these tests pin the tabulated polarization data and the d integrals
(closed-form same-center overlaps; variational lowering on water)."""

import numpy as np

from quemb_tpu.chem.integrals import overlap
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

WATER = "O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692"


def test_d_overlap_closed_forms():
    mol = Mole(atom="C 0 0 0", basis="6-31g*", spin=2)
    assert mol.nao == 15  # 9 (6-31G) + 6 cartesian d
    d = overlap(mol)[-6:, -6:]  # xx,xy,xz,yy,yz,zz
    assert abs(d[0, 0] - 1.0) < 1e-12
    assert abs(d[0, 3] - 1.0 / 3.0) < 1e-12
    assert abs(d[1, 1] - 1.0 / 3.0) < 1e-12
    assert abs(d[0, 1]) < 1e-14


def test_water_631gstar_rhf():
    mf = RHF(Mole(atom=WATER, basis="6-31g*"), conv_tol=1e-10)
    e_star = mf.kernel()
    e_plain = RHF(
        Mole(atom=WATER, basis="6-31g"), conv_tol=1e-10
    ).kernel()
    # regression anchor (this geometry, cartesian 6d); literature 6-31G*
    # water RHF energies sit at ~-76.0107 at the equilibrium geometry
    assert np.isclose(e_star, -76.010505, atol=2e-6)
    assert e_star < e_plain - 0.02  # polarization lowers variationally


def test_water_631gstar_be2():
    """BE on a d-function basis end-to-end (HF-in-HF invariant)."""
    from quemb_tpu import BE, fragmentate

    mol = Mole(atom=WATER, basis="6-31g*")
    mf = RHF(mol, conv_tol=1e-10)
    mf.kernel()
    fobj = fragmentate(mol=mol, n_BE=1, frag_type="chemgen",
                       print_frags=False)
    be = BE(mf, fobj)
    assert abs(be.ebe_hf - mf.e_tot) < 1e-6
    be.optimize(solver="MP2", only_chem=True)
    assert np.isfinite(be.ebe_tot)
