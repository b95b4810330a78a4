"""Legacy autogen fragmentation vs the reference's expected structures
(reference tests/fragmentation_test.py oracle)."""

import os
import sys

import pytest

from quemb_tpu import fragmentate
from quemb_tpu.chem.mole import Mole

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from autogen_expected import EXPECTED  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _check(fobj, target):
    assert fobj.AO_per_frag == target["AO_per_frag"]
    assert fobj.AO_per_edge_per_frag == target["AO_per_edge_per_frag"]
    assert (
        fobj.ref_frag_idx_per_edge_per_frag
        == target["ref_frag_idx_per_edge_per_frag"]
    )
    assert (
        fobj.relAO_per_origin_per_frag == target["relAO_per_origin_per_frag"]
    )
    assert [
        (w, list(idx))
        for w, idx in fobj.weight_and_relAO_per_center_per_frag
    ] == [
        (w, list(idx))
        for w, idx in target["weight_and_relAO_per_center_per_frag"]
    ]


@pytest.mark.parametrize("n_BE", [1, 2, 3])
def test_autogen_h_linear(n_BE):
    mol = Mole(
        atom=[("H", (0.0, 0.0, float(i))) for i in range(8)],
        basis="sto-3g",
        unit="angstrom",
    )
    fobj = fragmentate(
        mol=mol, n_BE=n_BE, frag_type="autogen", print_frags=False
    )
    _check(fobj, EXPECTED[f"test_autogen_h_linear_be{n_BE}"])


@pytest.mark.parametrize("n_BE", [1, 2, 3])
def test_autogen_octane(n_BE):
    mol = Mole.from_xyz_file(
        os.path.join(DATA, "xyz", "octane.xyz"), basis="sto-3g"
    )
    fobj = fragmentate(
        mol=mol, n_BE=n_BE, frag_type="autogen", print_frags=False
    )
    _check(fobj, EXPECTED[f"test_autogen_octane_be{n_BE}"])


def test_frag_types_oneshot_energy_consistency():
    """autogen / graphgen / chemgen one-shot CCSD energies agree on octane
    (the reference's energies_test pattern, fragmentation_test.py:330)."""
    import numpy as np

    from quemb_tpu import BE
    from quemb_tpu.chem.scf import RHF

    mol = Mole(
        atom="; ".join(f"H 0 0 {i * 1.0}" for i in range(8)),
        basis="sto-3g",
    )
    mf = RHF(mol, conv_tol=1e-12)
    mf.kernel()
    es = {}
    for ft in ("autogen", "graphgen", "chemgen"):
        fobj = fragmentate(
            mol=mol, n_BE=2, frag_type=ft, print_frags=False
        )
        be = BE(mf, fobj)
        be.oneshot(solver="CCSD")
        es[ft] = be.ebe_tot - be.ebe_hf
    for a in es:
        for b in es:
            assert np.isclose(es[a], es[b], atol=1e-6), (a, b, es)
