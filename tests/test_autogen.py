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
