"""Periodic fragmentation: FragPart for cells + fragmentate dispatch.

Replacement for the reference ``kbe/fragment.py`` (FragPart with
unitcell/kpt fields, reference kbe/fragment.py:24,139).  The "chemgen"
path mirrors the reference's chemgen-on-cell behavior (reference
chemfrag.py:433 ``BondConnectivity.from_cell``): bonds are detected with
minimum-image distances, so fragments that cross the cell boundary wrap
back into cell 0 of the supercell LO space.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from quemb_tpu.fragment.chemgen import ChemGenArgs, chemgen
from quemb_tpu.fragment.frag_part import FragPart
from quemb_tpu.kbe.cell import Cell


@dataclass
class KFragPart(FragPart):
    """FragPart over a Cell: adds the k-mesh and unitcell bookkeeping."""

    kpt: tuple[int, int, int] = (1, 1, 1)
    unitcell: int = 1

    @property
    def unitcell_nkpt(self) -> int:
        n = 1
        for i in self.kpt:
            if i > 1:
                n *= self.unitcell
        return n


def _min_image_bonds(cell: Cell, vdW_radius=None) -> dict[int, list[int]]:
    """Bond dictionary from minimum-image interatomic distances."""
    from quemb_tpu.fragment.chemgen import _resolve_radii
    from quemb_tpu.chem.elements import ANG2BOHR

    coords = cell.atom_coords()  # Bohr
    natm = cell.natm
    radii = _resolve_radii(cell.elements, vdW_radius) * ANG2BOHR
    # images: nearest shells suffice for bond detection
    ijk = np.array(
        [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
         for k in (-1, 0, 1)]
    )
    Ls = ijk @ cell.a
    d = coords[:, None, None, :] - coords[None, :, None, :] - Ls[None, None]
    dist = np.linalg.norm(d, axis=-1).min(axis=-1)  # [natm, natm] min-image
    thresh = radii[:, None] + radii[None, :]
    adj = (dist < thresh) & ~np.eye(natm, dtype=bool)
    return {i: sorted(np.nonzero(adj[i])[0].tolist()) for i in range(natm)}


def fragmentate(
    mol: Cell,
    kpt,
    *,
    n_BE: int = 2,
    frag_type: str = "chemgen",
    frozen_core: bool = False,
    unitcell: int = 1,
    iao_valence_basis: str | None = None,
    print_frags: bool = False,
    additional_args: ChemGenArgs | None = None,
) -> KFragPart:
    """Periodic fragmentation (reference kbe/fragment.py:139).

    ``chemgen``: minimum-image connectivity; fragment AO indices live in
    the cell-0 block of the supercell LO space (matches the reference's
    chemgen-on-cell semantics and its kBE baselines).
    """
    if frag_type not in ("chemgen", "autogen"):
        raise NotImplementedError(f"frag_type={frag_type}")
    args = additional_args or ChemGenArgs()
    if args.bonds_atoms is None:
        args = ChemGenArgs(
            h_treatment=args.h_treatment,
            swallow_replace=args.swallow_replace,
            bonds_atoms=_min_image_bonds(mol, args.vdW_radius),
        )
    fp = chemgen(
        mol,
        n_BE=n_BE,
        args=args,
        frozen_core=frozen_core,
        iao_valence_basis=iao_valence_basis,
        print_frags=print_frags,
    )
    return KFragPart(
        **{
            f: getattr(fp, f)
            for f in fp.__dataclass_fields__
            if fp.__dataclass_fields__[f].init
        },
        kpt=tuple(kpt),
        unitcell=unitcell,
    )
