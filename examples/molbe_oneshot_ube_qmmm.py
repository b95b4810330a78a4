"""Unrestricted BE with QM/MM charges
(ref example/molbe_oneshot_ube_qmmm.py).
"""

import numpy as np

from quemb_tpu.misc import be2puffin

charges = [-0.3, 0.3]
coords = [(-4.0, 0.0, 0.0), (4.0, 0.0, 0.0)]

e_corr = be2puffin(
    "tests/data/xyz/hexene.xyz", "sto-3g",
    pts_and_charges=(np.asarray(coords), np.asarray(charges)),
    n_BE=1, frozen_core=False, unrestricted=True, charge=-1, spin=1,
)
print(f"UBE QM/MM E_corr = {e_corr:.8f} Ha")
