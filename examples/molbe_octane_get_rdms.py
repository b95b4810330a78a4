"""Full-basis reduced density matrices (ref example/molbe_octane_get_rdms.py).

rdm1_fullbasis reassembles the global 1-/2-RDM from the matched
fragments; compute_energy_full recomputes the total energy from them.
"""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

mol = Mole.from_xyz_file("tests/data/xyz/octane.xyz", basis="sto-3g")
mf = RHF(mol, conv_tol=1e-12)
mf.kernel()

fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen")
mybe = BE(mf, fobj)
mybe.optimize(solver="CCSD")

rdm1, rdm2 = mybe.rdm1_fullbasis(return_RDM2=True)
print("rdm1 shape:", rdm1.shape, " rdm2 shape:", rdm2.shape)
mybe.compute_energy_full(approx_cumulant=True)
