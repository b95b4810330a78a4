"""Thiophene dimer, BE2/6-31G with IAO localization and frozen core.

Mirror of ref example/molbe_ppp.py (despite the legacy "ppp" filename the
reference example is this thiophene-dimer IAO workflow, not a model
Hamiltonian).  Runs the reference's 6-31g orbital basis (shipped tables
cover sulfur since the second-row completion) with an STO-3G IAO
valence basis."""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF

mol = Mole(
    atom="""
C  3.74360      5.55710      7.14890
C  3.18510      4.41510      6.58860
C  3.18510      4.41510      5.17210
C  3.74360      5.55710      4.61180
H  2.79260      3.59960      4.57700
H  2.79260      3.59960      7.18370
S  3.39270      4.78350      9.80840
S  4.27710      6.66240      5.88040
C  3.92620      5.88880     11.07700
C  4.48470      7.03070     10.51670
C  4.48470      7.03070      9.10020
C  3.92620      5.88870      8.53990
H  4.87720      7.84630      8.50510
H  4.87720      7.84630     11.11180
""",
    basis="6-31g",
)
mf = RHF(mol, conv_tol=1e-12)
mf.kernel()
fobj = fragmentate(
    mol=mol, n_BE=2, frag_type="chemgen",
    iao_valence_basis="sto-3g", frozen_core=True,
)
mybe = BE(mf, fobj, lo_method="IAO")
mybe.optimize(solver="CCSD")
print(f"E_tot = {mybe.ebe_tot:.8f} Ha")
