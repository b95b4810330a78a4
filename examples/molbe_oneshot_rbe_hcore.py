"""BE from an externally supplied core Hamiltonian
(ref example/molbe_oneshot_rbe_hcore.py): be2puffin accepts an hcore
matrix (optionally in libint AO ordering with libint_inp=True).
"""

import numpy as np

from quemb_tpu.chem import integrals
from quemb_tpu.chem.mole import Mole
from quemb_tpu.misc import be2puffin

xyz = "tests/data/xyz/octane.xyz"
mol = Mole.from_xyz_file(xyz, basis="sto-3g")
hcore = integrals.core_hamiltonian(mol)  # stand-in for an external hcore

e_corr = be2puffin(
    xyz, "sto-3g", hcore=hcore, n_BE=2, frozen_core=False,
)
print(f"one-shot BE2-CCSD E_corr = {e_corr:.8f} Ha")
