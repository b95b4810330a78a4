"""chemgen fragmentation vs expected structures (reference test fixtures)."""

import os

import pytest

from quemb_tpu.chem.mole import Mole
from quemb_tpu.fragment.chemgen import BondConnectivity, ChemGenArgs, chemgen

from conftest import DATA_DIR

OCTANE = os.path.join(DATA_DIR, "xyz", "octane.xyz")


@pytest.fixture(scope="module")
def octane():
    return Mole.from_xyz_file(OCTANE, basis="sto-3g")


def test_octane_connectivity(octane):
    conn = BondConnectivity.from_mole(octane)
    expected = {
        0: [1, 3, 5, 7],
        1: [0, 2, 4, 6],
        2: [1],
        3: [0],
        6: [1, 8, 10, 12],
        7: [0, 9, 11, 13],
        18: [12, 20, 22, 25],
    }
    for k, v in expected.items():
        assert conn.bonds_atoms[k].to_list() == v


def test_octane_be2_fragpart(octane):
    """Values from the reference's expected autogen/chemgen data."""
    fp = chemgen(octane, 2)
    assert fp.n_frag == 6
    assert fp.AO_per_frag[0] == [
        0, 1, 2, 3, 4, 11, 13, 5, 6, 7, 8, 9, 10, 12,
        19, 20, 21, 22, 23, 25, 27,
    ]  # fmt: skip
    assert fp.AO_per_edge_per_frag[0] == [
        [5, 6, 7, 8, 9, 10, 12],
        [19, 20, 21, 22, 23, 25, 27],
    ]
    assert fp.ref_frag_idx_per_edge_per_frag == [
        [1, 3], [0, 2], [1, 4], [0, 5], [2], [3],
    ]  # fmt: skip
    assert fp.relAO_per_origin_per_frag[0] == list(range(7))
    assert fp.weight_and_relAO_per_center_per_frag[4] == (
        1.0,
        list(range(15)),
    )


def test_h8_fragmentation():
    mol = Mole(
        atom="\n".join(f"H 0 0 {i}." for i in range(8)), basis="sto-3g"
    )
    args = ChemGenArgs(h_treatment="treat_H_like_heavy_atom")
    fp1 = chemgen(mol, 1, args)
    assert fp1.n_frag == 8
    assert fp1.all_centers_are_origins()

    fp2 = chemgen(mol, 2, args)
    assert fp2.n_frag == 6
    assert fp2.motifs_per_frag[0] == [1, 0, 2]
    assert fp2.origin_per_frag == [1, 2, 3, 4, 5, 6]

    fp3 = chemgen(
        mol,
        3,
        ChemGenArgs(
            h_treatment="treat_H_like_heavy_atom", swallow_replace=True
        ),
    )
    assert fp3.n_frag == 8
    assert fp3.all_centers_are_origins()


def test_frozen_core_ao_indices(octane):
    fp = chemgen(octane, 2, frozen_core=True)
    # with frozen core the 1s of each C is dropped: 4 AOs per C, 1 per H
    assert fp.AO_per_frag[0][:4] == [0, 1, 2, 3]
    assert len(fp.AO_per_frag[0]) == 4 * 3 + 6  # 3 C + 6 H per BE2 fragment
