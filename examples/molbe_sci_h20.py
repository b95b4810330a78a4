"""Selected CI (heat-bath style) as the fragment solver
(ref example/molbe_sci_h20.py). Runtime: ~1 min.
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
mybe.oneshot(solver="SCI")
print(f"BE2-SCI: E_tot = {mybe.ebe_tot:.8f} Ha")
