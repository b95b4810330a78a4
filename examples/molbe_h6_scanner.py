"""Finite-difference BE nuclear gradient via the scanner
(ref example/molbe_h6_scanner.py): only the displaced fragment is
re-solved per FD probe. Runtime: ~1 min.
"""

import numpy as np

from quemb_tpu.chem.mole import Mole
from quemb_tpu.scanner import Energy, fd_gradient

mol = Mole(
    atom="; ".join(f"H 0 0 {i * 0.74}" for i in range(6)),
    basis="sto-3g",
)
scan = Energy(basis="sto-3g", n_BE=2, solver="CCSD", oneshot=True)
g = fd_gradient(scan, mol, step=1e-4)
print("|grad| =", np.linalg.norm(g))
