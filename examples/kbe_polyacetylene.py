"""Periodic BE on trans-polyacetylene (ref example/kbe_polyacetylene.py).

k-point GDF + supercell Schmidt decomposition; frozen core; CCSD
matching. Runtime: ~10 min on CPU (dominated by the DF build).
"""

import numpy as np

from quemb_tpu.kbe.cell import Cell
from quemb_tpu.kbe.fragment import fragmentate
from quemb_tpu.kbe.pbe import BE
from quemb_tpu.kbe.scf import KRHF

lat = np.eye(3) * 12.0
lat[2, 2] = 2.455 * 2

atoms = """
H      1.4285621630072645    0.0    -0.586173422487319
C      0.3415633681566205    0.0    -0.5879921146011252
H     -1.4285621630072645    0.0     0.586173422487319
C     -0.3415633681566205    0.0     0.5879921146011252
H      1.4285621630072645    0.0     1.868826577512681
C      0.3415633681566205    0.0     1.867007885398875
H     -1.4285621630072645    0.0     3.041173422487319
C     -0.3415633681566205    0.0     3.0429921146011254
"""
cell = Cell(atom=atoms, a=lat, basis="sto-3g")
kpts = cell.make_kpts([1, 1, 3])
mf = KRHF(cell, kpts, omega=0.6, conv_tol=1e-11)
mf.kernel()

kfrag = fragmentate(
    mol=cell, kpt=[1, 1, 3], n_BE=2, frag_type="chemgen", frozen_core=True
)
mykbe = BE(mf, kfrag, kpts=kpts)
mykbe.optimize(solver="CCSD")
print(f"kBE2-CCSD: E_tot = {mykbe.ebe_tot:.8f} Ha/cell")
