"""Graphgen (shortest-path) fragmentation vs the reference's expected
index structures (reference tests/fragmentation_test.py oracle)."""

import os
import sys

import pytest

from quemb_tpu import fragmentate
from quemb_tpu.chem.mole import Mole

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from graphgen_expected import EXPECTED  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _t(x):
    """Deep-convert nested sequences to tuples (type-agnostic equality)."""
    if isinstance(x, (list, tuple)):
        return tuple(_t(i) for i in x)
    return x


def _check(fobj, target):
    assert _t(fobj.AO_per_frag) == _t(target["AO_per_frag"])
    assert _t(fobj.AO_per_edge_per_frag) == _t(
        target["AO_per_edge_per_frag"]
    )
    assert _t(fobj.ref_frag_idx_per_edge_per_frag) == _t(
        target["ref_frag_idx_per_edge_per_frag"]
    )
    assert _t(fobj.relAO_per_origin_per_frag) == _t(
        target["relAO_per_origin_per_frag"]
    )
    assert _t(fobj.weight_and_relAO_per_center_per_frag) == _t(
        target["weight_and_relAO_per_center_per_frag"]
    )


@pytest.mark.parametrize("n_BE", [1, 2, 3])
def test_graphgen_h_linear(n_BE):
    mol = Mole(
        atom=[("H", (0.0, 0.0, float(i))) for i in range(8)],
        basis="sto-3g",
        unit="angstrom",
    )
    fobj = fragmentate(
        mol=mol, n_BE=n_BE, frag_type="graphgen", print_frags=False
    )
    _check(fobj, EXPECTED[f"test_graphgen_h_linear_be{n_BE}"])


@pytest.mark.parametrize("n_BE", [1, 2, 3])
def test_graphgen_octane(n_BE):
    mol = Mole.from_xyz_file(
        os.path.join(DATA, "xyz", "octane.xyz"), basis="sto-3g"
    )
    fobj = fragmentate(
        mol=mol, n_BE=n_BE, frag_type="graphgen", print_frags=False
    )
    _check(fobj, EXPECTED[f"test_graphgen_octane_be{n_BE}"])
