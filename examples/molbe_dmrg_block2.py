"""DMRG fragment solver (ref example/molbe_dmrg_block2.py).

The reference shells out to block2; that external C++ package is not
available here, so solver="DMRG" raises NotImplementedError by design
(same gating as upstream without block2 installed). This script shows
the intended call and falls back to FCI, which is exact for these
fragment sizes.
"""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

mol = Mole(
    atom="; ".join(f"H 0 0 {i * 0.74}" for i in range(8)),
    basis="sto-3g",
)
mf = RHF(mol, conv_tol=1e-12)
mf.kernel()
fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen")
mybe = BE(mf, fobj)
try:
    mybe.optimize(solver="DMRG")
except NotImplementedError as e:
    print("DMRG:", e)
    mybe.optimize(solver="FCI")
print(f"E_tot = {mybe.ebe_tot:.10f} Ha")
