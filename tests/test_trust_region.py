"""QN-vs-trust-region consistency (reference tests/dm_molBE_test.py).

Both globalizations of the FrankQN matching loop (Li-Fukushima line
search and the dog-leg trust region) must converge the distorted-H8 BE2
density matching to the same fixed point.
"""

from quemb_tpu import BE, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF
from quemb_tpu.fragment.chemgen import ChemGenArgs


def test_h8_sto3g_be2_trust_region_matches_line_search():
    atoms = [("H", (0.0, 0.0, float(i))) for i in range(7)]
    atoms.append(("H", (0.0, 0.0, 4.2)))
    mol = Mole(atom=atoms, basis="sto-3g", unit="angstrom")
    mf = RHF(mol, conv_tol=1e-12)
    mf.kernel()
    fobj = fragmentate(
        mol=mol,
        n_BE=2,
        frag_type="chemgen",
        print_frags=False,
        additional_args=ChemGenArgs(
            h_treatment="treat_H_like_heavy_atom"
        ),
    )
    be1 = BE(mf, fobj)
    be1.optimize(solver="CCSD", method="QN", trust_region=False)
    be2 = BE(mf, fobj)
    be2.optimize(solver="CCSD", method="QN", trust_region=True)
    assert abs(be1.ebe_tot - be2.ebe_tot) < 1e-6
