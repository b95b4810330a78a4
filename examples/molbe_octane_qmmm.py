"""BE with QM/MM point charges (ref example/molbe_octane_qmmm.py):
the MM charges enter the core Hamiltonian and the nuclear energy.
"""

import numpy as np

from quemb_tpu.misc import be2puffin

charges = [-0.2, -0.1, 0.15, 0.2]
coords = [(-3.0, -8.0, -2.0), (-2.5, 4.0, -1.0), (2.0, 1.0, 1.5),
          (1.0, -5.0, 2.0)]

e_corr = be2puffin(
    "tests/data/xyz/octane.xyz",
    "sto-3g",
    pts_and_charges=(np.asarray(coords), np.asarray(charges)),
    n_BE=2,
    frozen_core=False,
)
print(f"QM/MM one-shot BE2 E_corr = {e_corr:.8f} Ha")
