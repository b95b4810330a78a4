"""IAO+PAO localization with a minimal valence basis
(ref example/molbe_hexene_iaos.py). Runtime: minutes.
"""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

mol = Mole.from_xyz_file("tests/data/xyz/hexene.xyz", basis="6-31g")
mf = RHF(mol, conv_tol=1e-12)
mf.kernel()

fobj = fragmentate(
    mol=mol, n_BE=2, frag_type="chemgen",
    iao_valence_basis="sto-3g", frozen_core=True,
)
mybe = BE(mf, fobj, lo_method="IAO")
mybe.oneshot(solver="CCSD")
print(f"BE2-CCSD(IAO): E_corr = {mybe.ebe_tot - mybe.ebe_hf:.8f} Ha")
