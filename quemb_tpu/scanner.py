"""Potential-energy-surface scanner + finite-difference gradients.

Covers the reference ``molbe/scanner.py`` API surface: an ``Energy`` object
whose ``as_scanner()`` returns a callable evaluating the BE total energy at
displaced geometries, plus finite-difference gradient/Hessian helpers.  The
reference's displaced-fragment shortcut (re-initializing only the displaced
fragment, scanner.py:217) is an optimization to add later; here every probe
geometry runs the full (jitted, cached-compile) pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from quemb_tpu.chem.elements import BOHR2ANG
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF


@dataclass
class Energy:
    """BE energy evaluator over geometries (reference scanner.py:381)."""

    basis: str
    n_BE: int = 2
    solver: str = "CCSD"
    frag_type: str = "chemgen"
    only_chem: bool = False
    oneshot: bool = False
    frozen_core: bool = False
    charge: int = 0
    additional_args: object = None
    conv_tol_hf: float = 1e-12

    last_result: dict = field(default_factory=dict)

    def energy(self, mol: Mole) -> float:
        from quemb_tpu import BE, fragmentate

        mf = RHF(mol, conv_tol=self.conv_tol_hf)
        mf.kernel()
        fobj = fragmentate(
            mol=mol,
            n_BE=self.n_BE,
            frag_type=self.frag_type,
            frozen_core=self.frozen_core,
            additional_args=self.additional_args,
            print_frags=False,
        )
        mybe = BE(mf, fobj)
        if self.oneshot:
            mybe.oneshot(solver=self.solver)
        else:
            mybe.optimize(solver=self.solver, only_chem=self.only_chem)
        self.last_result = {
            "e_tot": mybe.ebe_tot,
            "e_hf": mybe.ebe_hf,
            "e_corr": mybe.ebe_tot - mybe.ebe_hf,
        }
        return mybe.ebe_tot

    def energy_at(self, coords_bohr: np.ndarray, elements: list[str]) -> float:
        mol = Mole(
            atom=[
                (el, xyz * BOHR2ANG)
                for el, xyz in zip(elements, coords_bohr)
            ],
            basis=self.basis,
            charge=self.charge,
        )
        return self.energy(mol)

    def as_scanner(self):
        """Callable mol -> energy (pyscf as_scanner convention)."""
        return self.energy


def fd_gradient(
    scanner: Energy,
    mol: Mole,
    step: float = 1e-3,
) -> np.ndarray:
    """Central-difference nuclear gradient dE/dR [natm, 3] (Ha/Bohr)."""
    coords = mol.atom_coords()
    elements = mol.elements
    grad = np.zeros_like(coords)
    for ia in range(mol.natm):
        for d in range(3):
            cp = coords.copy()
            cp[ia, d] += step
            ep = scanner.energy_at(cp, elements)
            cm = coords.copy()
            cm[ia, d] -= step
            em = scanner.energy_at(cm, elements)
            grad[ia, d] = (ep - em) / (2 * step)
    return grad


def fd_hessian_diag(
    scanner: Energy, mol: Mole, step: float = 1e-3
) -> np.ndarray:
    """Diagonal second derivatives d2E/dR2 [natm, 3] (Ha/Bohr^2)."""
    coords = mol.atom_coords()
    elements = mol.elements
    e0 = scanner.energy_at(coords, elements)
    hess = np.zeros_like(coords)
    for ia in range(mol.natm):
        for d in range(3):
            cp = coords.copy()
            cp[ia, d] += step
            ep = scanner.energy_at(cp, elements)
            cm = coords.copy()
            cm[ia, d] -= step
            em = scanner.energy_at(cm, elements)
            hess[ia, d] = (ep + em - 2 * e0) / step**2
    return hess
