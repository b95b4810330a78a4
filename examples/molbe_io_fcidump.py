"""Export each fragment Hamiltonian as an FCIDUMP file
(ref example/molbe_io_fcidump.py) for external solvers.
"""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF
from quemb_tpu.utils.io import be2fcidump

mol = Mole(
    atom="; ".join(f"H 0 0 {i * 0.74}" for i in range(8)),
    basis="sto-3g",
)
mf = RHF(mol, conv_tol=1e-12)
mf.kernel()
fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen")
mybe = BE(mf, fobj)
be2fcidump(mybe, "/tmp/quemb_fcidump/f_", "fragment_mo")
print("FCIDUMP files written to /tmp/quemb_fcidump/")
