"""Unrestricted BE: one-shot UCCSD on the hexene triplet anion
(ref example/molbe_hexene_oneshot_uccsd.py). Runtime: minutes.
"""

from quemb_tpu import fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import UHF
from quemb_tpu.ube import UBE

mol = Mole.from_xyz_file(
    "tests/data/xyz/hexene.xyz", basis="sto-3g", charge=-1, spin=1
)
mf = UHF(mol, conv_tol=1e-11)
mf.kernel()

fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen")
ube = UBE(mf, fobj)
ube.oneshot(solver="UCCSD")
print(f"UBE2-UCCSD: E_corr = {ube.ebe_tot - ube.ebe_hf:.8f} Ha")
