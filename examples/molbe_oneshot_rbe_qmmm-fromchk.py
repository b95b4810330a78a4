"""Restart a QM/MM BE run from a saved mean-field checkpoint
(ref example/molbe_oneshot_rbe_qmmm-fromchk.py). Both our .npz format
and pyscf HDF5 .chk files are accepted.
"""

import numpy as np

from quemb_tpu.misc import be2puffin

charges = [-0.2, -0.1, 0.15, 0.2]
coords = [(-3.0, -8.0, -2.0), (-2.5, 4.0, -1.0), (2.0, 1.0, 1.5),
          (1.0, -5.0, 2.0)]

# first run: writes the checkpoint
be2puffin(
    "tests/data/xyz/octane.xyz", "sto-3g",
    pts_and_charges=(np.asarray(coords), np.asarray(charges)),
    n_BE=2, frozen_core=False, checkfile="/tmp/qmmm_scf.npz",
)
# later run: skips the SCF entirely
e_corr = be2puffin(
    "tests/data/xyz/octane.xyz", "sto-3g",
    pts_and_charges=(np.asarray(coords), np.asarray(charges)),
    n_BE=2, frozen_core=False, from_chk=True,
    checkfile="/tmp/qmmm_scf.npz",
)
print(f"from-checkpoint E_corr = {e_corr:.8f} Ha")
