"""Periodic fragmentation index-structure oracle.

Pins the repo's periodic autogen (supercell-extended fragments,
kbe/fragment.py) against the REFERENCE's legacy periodic autogen output
(kbe/autofrag.py:261) for polyacetylene 1x1x3 — captured structures in
tests/data/kbe_autogen_expected.py.  The two constructions order
fragment AO lists differently, so parity is asserted at the level that
defines the physics: per-fragment AO sets, global center AO sets,
per-edge AO sets, and the edge -> reference-center cross-links.
"""

import os
import sys

import numpy as np
import pytest

from quemb_tpu.kbe.fragment import fragmentate
from quemb_tpu.kbe.pbc_int import Cell

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from kbe_autogen_expected import EXPECTED  # noqa: E402

LAT = np.diag([8.0, 8.0, 2.455 * 2])
ATOMS = """
H      1.4285621630072645    0.0    -0.586173422487319
C      0.3415633681566205    0.0    -0.5879921146011252
H     -1.4285621630072645    0.0     0.586173422487319
C     -0.3415633681566205    0.0     0.5879921146011252
H      1.4285621630072645    0.0     1.868826577512681
C      0.3415633681566205    0.0     1.867007885398875
H     -1.4285621630072645    0.0     3.041173422487319
C     -0.3415633681566205    0.0     3.0429921146011254
"""


def _ref_views(exp):
    """(frag AO sets, center AO sets, edge map) from the captured data."""
    frag_sets = [frozenset(a) for a in exp["AO_per_frag"]]
    centers = [
        frozenset(exp["AO_per_frag"][i][r] for r in rel[1])
        for i, rel in enumerate(exp["weight_and_relAO_per_center_per_frag"])
    ]
    edge_links = []
    for i, edges in enumerate(exp["AO_per_edge_per_frag"]):
        refs = exp["ref_frag_idx_per_edge_per_frag"][i]
        edge_links.append(
            {frozenset(e): frag_sets[r] for e, r in zip(edges, refs)}
        )
    return frag_sets, centers, edge_links


def _repo_views(fp):
    frag_sets = [frozenset(int(i) for i in a) for a in fp.AO_per_frag]
    centers = [
        frozenset(int(fp.AO_per_frag[i][r]) for r in rel[1])
        for i, rel in enumerate(fp.weight_and_relAO_per_center_per_frag)
    ]
    edge_links = []
    for i, edges in enumerate(fp.AO_per_edge_per_frag):
        refs = fp.ref_frag_idx_per_edge_per_frag[i]
        edge_links.append(
            {
                frozenset(int(x) for x in e): frag_sets[r]
                for e, r in zip(edges, refs)
            }
        )
    return frag_sets, centers, edge_links


@pytest.mark.parametrize("n_BE", [2, 3])
def test_polyacetylene_113_autogen_structures(n_BE):
    cell = Cell(atom=ATOMS, a=LAT, basis="sto-3g")
    fp = fragmentate(
        mol=cell, kpt=[1, 1, 3], n_BE=n_BE, frag_type="autogen",
        frozen_core=True,
    )
    exp = EXPECTED[f"polyacetylene_113_be{n_BE}"]
    ref_frags, ref_centers, ref_edges = _ref_views(exp)
    got_frags, got_centers, got_edges = _repo_views(fp)

    assert len(got_frags) == len(ref_frags)
    # match repo fragments to reference fragments by their AO sets
    order = []
    for fs in got_frags:
        assert fs in ref_frags, f"unmatched fragment AO set {sorted(fs)}"
        order.append(ref_frags.index(fs))
    assert sorted(order) == list(range(len(ref_frags)))

    for i, j in enumerate(order):
        assert got_centers[i] == ref_centers[j]
        assert got_edges[i] == ref_edges[j]
