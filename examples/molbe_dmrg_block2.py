"""DMRG fragment solver (ref example/molbe_dmrg_block2.py).

solver="DMRG" dispatches to the block2 adapter
(quemb_tpu/solvers/dmrg.py) when pyblock2 is importable and raises the
optional-dependency hint otherwise (the reference's own gating,
molbe/solver.py:949).  This script shows the call and falls back to
FCI when block2 is absent, which is exact for these fragment sizes.
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
