"""BE chemical-potential matching only (ref example/molbe_h8_chemical_potential.py).

only_chem=True matches just the global electron count via a chemical
potential on the fragment centers. Runtime: seconds.
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
mybe.optimize(solver="FCI", only_chem=True)
print(f"BE2-FCI (chem. potential only): {mybe.ebe_tot:.10f} Ha")
