"""BE density matching on an H8 chain (ref example/molbe_h8_density_matching.py).

Runtime: seconds on CPU. Expected E_corr ~ -0.1343 Ha (BASELINE.md).
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
mybe.optimize(solver="FCI")  # matches edge/center densities
print(f"BE2-FCI total energy: {mybe.ebe_tot:.10f} Ha")
