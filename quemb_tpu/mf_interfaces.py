"""Mean-field interchange: dump/load converged SCF solutions.

Replacement for the reference ``molbe/mf_interfaces/main.py`` (load_scf /
dump_scf at :138-155 and kbe/mf_interfaces) -- the decoupling layer that
lets BE consume a mean field computed elsewhere (another machine, another
program, a previous run) without re-running SCF.  Serialization is npz
(geometry + basis name + MO data); ``load_scf`` rebuilds the Mole/Cell and
a converged mean-field object whose integrals regenerate on demand from
the own integral engine.

An external program's AO ordering must match this framework's (PySCF
cartesian convention, chem/mole.py docstring); reordering hooks for other
conventions (the reference's ORCA f/g/h fixes, orca_interface.py:100-120)
can be layered on the coefficients before dumping.
"""

from __future__ import annotations

import numpy as np

from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF, UHF

__all__ = ["dump_scf", "load_scf", "dump_kscf", "load_kscf"]


def _mol_payload(mol) -> dict:
    return dict(
        elements=np.array(mol.elements),
        coords_bohr=mol.atom_coords(),
        basis=np.array(mol.basis),
        charge=np.int64(mol.charge),
        spin=np.int64(mol.spin),
    )


def _rebuild_mol(data, cls=Mole, **extra):
    atoms = [
        (str(sym), xyz)
        for sym, xyz in zip(data["elements"], data["coords_bohr"])
    ]
    return cls(
        atom=atoms,
        basis=str(data["basis"]),
        charge=int(data["charge"]),
        spin=int(data["spin"]),
        unit="bohr",
        **extra,
    )


def dump_scf(mf, chkfile) -> None:
    """Store a converged RHF/UHF (geometry + basis + MOs) to ``chkfile``."""
    payload = _mol_payload(mf.mol)
    payload.update(
        e_tot=np.float64(mf.e_tot),
        mo_energy=np.asarray(mf.mo_energy),
        mo_coeff=np.asarray(mf.mo_coeff),
        unrestricted=np.bool_(isinstance(mf, UHF)),
    )
    np.savez(chkfile, **payload)


def load_scf(chkfile):
    """Recreate (mol, converged mf) from a :func:`dump_scf` file."""
    data = np.load(chkfile, allow_pickle=False)
    mol = _rebuild_mol(data)
    mf = UHF(mol) if bool(data["unrestricted"]) else RHF(mol)
    mf.mo_coeff = data["mo_coeff"]
    mf.mo_energy = data["mo_energy"]
    mf.e_tot = float(data["e_tot"])
    mf.converged = True
    return mol, mf


def dump_kscf(mf, chkfile) -> None:
    """Store a converged KRHF (reference kbe/mf_interfaces/main.py)."""
    payload = _mol_payload(mf.cell)
    payload.update(
        a=mf.cell.a,
        kpts=mf.kpts,
        e_tot=np.float64(mf.e_tot),
        mo_energy=np.asarray(mf.mo_energy),
        mo_coeff=np.asarray(mf.mo_coeff),
        hf_veff=np.asarray(mf.hf_veff),
        S=np.asarray(mf.get_ovlp()),
        hcore=np.asarray(mf.get_hcore()),
    )
    np.savez(chkfile, **payload)


def load_kscf(chkfile):
    """Recreate (cell, converged KRHF-like) from :func:`dump_kscf`.

    The cached S/hcore/veff ship in the file, so no periodic integral
    rebuild is needed to construct a kbe.BE -- only the DF build for the
    embedding ERI transform.
    """
    from quemb_tpu.kbe.cell import Cell
    from quemb_tpu.kbe.scf import KRHF

    data = np.load(chkfile, allow_pickle=False)
    atoms = [
        (str(sym), xyz)
        for sym, xyz in zip(data["elements"], data["coords_bohr"])
    ]
    cell = Cell(
        atom=atoms,
        a=data["a"],
        basis=str(data["basis"]),
        charge=int(data["charge"]),
        unit="bohr",
    )
    mf = KRHF(cell, data["kpts"])
    mf.mo_coeff = data["mo_coeff"]
    mf.mo_energy = data["mo_energy"]
    mf.e_tot = float(data["e_tot"])
    mf.hf_veff = data["hf_veff"]
    mf._S = data["S"]
    mf._hcore = data["hcore"]
    mf.converged = True
    return cell, mf
