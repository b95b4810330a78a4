"""UBE / UCCSD tests (closed-shell consistency; open-shell smoke)."""

import numpy as np
import pytest

from quemb_tpu import ChemGenArgs, fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import RHF, UHF
from quemb_tpu.ube import UBE


def test_uhf_closed_shell_matches_rhf():
    mol = Mole(
        atom="O 0 0 0.1173; H 0 0.7572 -0.4692; H 0 -0.7572 -0.4692",
        basis="sto-3g",
    )
    e_r = RHF(mol).kernel()
    e_u = UHF(mol).kernel()
    assert np.isclose(e_r, e_u, atol=1e-10)


def test_uhf_open_shell():
    oh = Mole(atom="O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    mf = UHF(oh)
    e = mf.kernel()
    assert mf.converged
    assert np.isclose(e, -74.3627, atol=1e-3)  # literature STO-3G UHF


def test_ube_closed_shell_consistency():
    """UBE-UCCSD on a closed-shell system tracks restricted BE-CCSD.

    The two paths use slightly different effective Fock operators (mirroring
    the reference), so agreement is approximate.
    """
    from quemb_tpu import BE

    mol = Mole(
        atom="\n".join(f"H 0 0 {i}." for i in range(6)), basis="sto-3g"
    )
    mfr = RHF(mol, conv_tol=1e-12)
    mfr.kernel()
    mfu = UHF(mol, conv_tol=1e-12)
    mfu.kernel()
    args = ChemGenArgs(h_treatment="treat_H_like_heavy_atom")
    fobj = fragmentate(
        mol=mol, n_BE=2, frag_type="chemgen", additional_args=args,
        print_frags=False,
    )
    be = BE(mfr, fobj)
    be.oneshot(solver="CCSD")
    ube = UBE(mfu, fobj)
    ube.oneshot()
    e_r = be.ebe_tot - be.ebe_hf
    e_u = ube.ebe_tot - ube.uhf_full_e
    assert abs(ube.ebe_hf - mfu.e_tot) < 1e-9  # HF-in-HF
    assert abs(e_u - e_r) < 2e-3
    assert e_u < 0


def test_ube_open_shell_smoke():
    mol = Mole(
        atom="\n".join(f"H 0 0 {i}." for i in range(5)),
        basis="sto-3g",
        spin=1,
    )
    mf = UHF(mol, conv_tol=1e-11)
    mf.kernel()
    args = ChemGenArgs(h_treatment="treat_H_like_heavy_atom")
    fobj = fragmentate(
        mol=mol, n_BE=2, frag_type="chemgen", additional_args=args,
        print_frags=False,
    )
    ube = UBE(mf, fobj)
    ube.oneshot()
    e_corr = ube.ebe_tot - ube.uhf_full_e
    assert -0.2 < e_corr < 0.0


def test_ube_be1_equals_whole_molecule_uccsd():
    """BE1 = whole-molecule limit: the full UBE pipeline (per-spin Schmidt,
    fragment SCF, cumulant energy assembly) must reproduce a direct UCCSD
    of the full system run on the canonical UHF MOs -- an external check
    of the UBE assembly with no fragment machinery in the oracle path
    (reference ube-oneshot_test.py:31 semantics)."""
    import jax.numpy as jnp

    from quemb_tpu.solvers.uccsd import _mo4, solve_uccsd_so

    oh = Mole(atom="O 0 0 0; H 0 0 0.97", basis="sto-3g", spin=1)
    mf = UHF(oh, conv_tol=1e-12)
    mf.kernel()
    assert mf.converged

    # direct whole-molecule UCCSD from the canonical UHF solution
    eri = mf.get_eri()
    Ca, Cb = (jnp.asarray(c) for c in mf.mo_coeff)
    Vaa = np.asarray(_mo4(jnp.asarray(eri), Ca, Ca, Ca, Ca))
    Vbb = np.asarray(_mo4(jnp.asarray(eri), Cb, Cb, Cb, Cb))
    Vab = np.asarray(_mo4(jnp.asarray(eri), Ca, Ca, Cb, Cb))
    na = (oh.nelectron + oh.spin) // 2
    nb = oh.nelectron - na
    _, _, e_direct = solve_uccsd_so(
        Vaa, Vbb, Vab,
        np.diag(mf.mo_energy[0]), np.diag(mf.mo_energy[1]),
        na, nb,
    )

    # UBE one-shot on the single whole-molecule BE1 fragment
    fobj = fragmentate(
        mol=oh, n_BE=1, frag_type="chemgen", print_frags=False
    )
    assert fobj.n_frag == 1
    ube = UBE(mf, fobj)
    ube.oneshot()
    e_ube = ube.ebe_tot - ube.uhf_full_e
    assert abs(ube.ebe_hf - mf.e_tot) < 1e-9  # HF-in-HF
    assert abs(e_ube - e_direct) < 1e-7
