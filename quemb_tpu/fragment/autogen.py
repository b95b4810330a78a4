"""Legacy distance-cutoff fragmentation front-end ("autogen").

The reference's autogen (molbe/autofrag.py:224) detects bonds with hard-coded
cutoffs (1.8 A heavy-heavy, 1.2 A X-H) and builds BE(n) fragments from the
resulting graph.  Here it is realized as the chemgen machinery driven by that
distance-based connectivity, producing the same FragPart contract (for the
reference's test systems the two front-ends agree).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quemb_tpu.chem.elements import BOHR2ANG
from quemb_tpu.chem.mole import Mole
from quemb_tpu.fragment.chemgen import ChemGenArgs, chemgen
from quemb_tpu.fragment.frag_part import FragPart

BOND_CUTOFF = 1.8  # Angstrom, heavy-heavy (reference autofrag.py bond)
HBOND_CUTOFF = 1.2  # Angstrom, X-H (reference autofrag.py hbond)


@dataclass
class AutogenArgs:
    iao_valence_only: bool = False


def _distance_bonds(mol: Mole) -> dict[int, set[int]]:
    coords = mol.atom_coords() * BOHR2ANG
    elements = mol.elements
    natm = mol.natm
    bonds: dict[int, set[int]] = {i: set() for i in range(natm)}
    for i in range(natm):
        for j in range(i + 1, natm):
            d = float(np.linalg.norm(coords[i] - coords[j]))
            cut = (
                HBOND_CUTOFF
                if "H" in (elements[i], elements[j])
                else BOND_CUTOFF
            )
            if d < cut:
                bonds[i].add(j)
                bonds[j].add(i)
    return bonds


def autogen(
    mol: Mole,
    n_BE: int = 2,
    frozen_core: bool = True,
    iao_valence_basis: str | None = None,
    print_frags: bool = True,
    iao_valence_only: bool = False,
) -> FragPart:
    if n_BE > 4:
        raise ValueError(
            "n_BE > 4 not supported, use 'chemgen' or 'graphgen' instead."
        )
    if n_BE < 1:
        raise ValueError("n_BE < 1 does not make sense.")
    bonds = _distance_bonds(mol)
    all_h = all(e == "H" for e in mol.elements)
    fp = chemgen(
        mol,
        n_BE,
        ChemGenArgs(
            bonds_atoms=bonds,
            h_treatment=(
                "treat_H_like_heavy_atom" if all_h else "treat_H_diff"
            ),
        ),
        frozen_core=frozen_core,
        iao_valence_basis=iao_valence_basis,
        print_frags=print_frags,
    )
    fp.frag_type = "autogen"
    return fp
