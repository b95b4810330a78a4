"""Generate the hexadecane (C16H34/STO-3G) DF-HF fixture for the
sparse-DF benchmark section of bench.py.

The point of the fixture: a system large enough that the S_abs screen
actually removes AOs (reach fraction < 1), solved WITHOUT ever forming
the 4-center ERI (DF-JK mean field) -- the regime sparse-DF exists for.
Stores hcore/S/C/moe/e_tot only (no ERI).

Run:  JAX_PLATFORMS=cpu python .scripts/make_chain_fixture.py [n_carbons]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quemb_tpu.utils.geometry import alkane_atoms


def main(n=16, auxbasis=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from quemb_tpu.chem.mole import Mole
    from quemb_tpu.chem.scf import RHF

    mol = Mole(atom=alkane_atoms(n), basis="sto-3g")
    print(f"C{n}H{2*n+2}: nao = {mol.nao}, aux = {auxbasis or 'default'}")
    # Long chains: the default even-tempered aux explodes (naux ~ 31x nao
    # at C40 -- the H l=2 floor), making the DF-HF hours of single-core
    # work for no fixture-relevant gain; pass e.g. "etb:3.0" to keep it
    # ~10 min.  The fixture only ships S/C/hcore; the bench demo builds
    # its own (leaner, stated) demo factor.
    mf = RHF(mol, conv_tol=1e-10, with_df=True, auxbasis=auxbasis)
    mf.kernel()
    print("DF-HF e_tot =", mf.e_tot, " converged:", mf.converged)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "fixtures", f"c{n}_sto3g_dfhf.npz")
    np.savez_compressed(
        out,
        hcore=mf.get_hcore(), S=mf.get_ovlp(), C=mf.mo_coeff,
        moe=mf.mo_energy, e_tot=mf.e_tot, veff=mf.get_veff(),
        n_carbons=n,
    )
    print("wrote", out)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        sys.argv[2] if len(sys.argv) > 2 else None,
    )
