"""Potential-energy scan over H2 bond lengths via the scanner API
(ref example/molbe_h2_scanner.py).
"""

from quemb_tpu.chem.mole import Mole
from quemb_tpu.scanner import Energy

scan = Energy(basis="sto-3g", n_BE=1, solver="FCI", oneshot=True)
get_energy = scan.as_scanner()
for r in (0.65, 0.74, 0.85, 1.0):
    mol = Mole(atom=f"H 0 0 0; H 0 0 {r}", basis="sto-3g")
    print(f"r = {r:.2f} A   E = {get_energy(mol):.8f} Ha")
