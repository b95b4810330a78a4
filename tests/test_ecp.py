"""Semi-local ECP integrals (chem/ecp.py) + end-to-end threading.

The reference forwards ``ecp`` to PySCF's libecp (molbe/misc.py:266,331);
here the quadrature implementation is validated against closed forms and
through the BE pipeline's HF-in-HF invariant.
"""

import numpy as np
import pytest

from quemb_tpu.chem.ecp import ECPData, ecp_matrix
from quemb_tpu.chem.mole import Mole


def _analytic_sss(mol, alpha, C):
    """<mu|exp(-alpha |r-C|^2)|nu> for an all-s (contracted) basis."""
    nao = mol.nao
    V = np.zeros((nao, nao))
    for shi in mol.shells:
        for shj in mol.shells:
            assert shi.l == 0 and shj.l == 0
            acc = 0.0
            for a, ca in zip(shi.exps, np.ravel(shi.coefs)):
                for b, cb in zip(shj.exps, np.ravel(shj.coefs)):
                    p = a + b
                    P = (a * shi.center + b * shj.center) / p
                    K1 = np.exp(
                        -a * b / p
                        * np.sum((shi.center - shj.center) ** 2)
                    )
                    q = p + alpha
                    K2 = np.exp(-p * alpha / q * np.sum((P - C) ** 2))
                    acc += ca * cb * K1 * K2 * (np.pi / q) ** 1.5
            V[shi.ao_offset, shj.ao_offset] = acc
    return V


def test_local_term_vs_analytic():
    mol = Mole(atom="H 0 0 0; H 0 0 0.9", basis="sto-3g")
    C = np.asarray(mol._atoms[0][1])
    alpha, c = 1.3, 2.5
    ecp = {"H": ECPData(ncore=0, local=[(2, alpha, c)])}
    V = ecp_matrix(mol, ecp)
    # the quadrature runs over BOTH H centers (same element); restrict
    # the analytic sum to one center by giving only atom 0 an ECP via a
    # distinct label is not possible with element keying -- so compare
    # against the two-center analytic sum.
    C2 = np.asarray(mol._atoms[1][1])
    V_ref = c * (_analytic_sss(mol, alpha, C)
                 + _analytic_sss(mol, alpha, C2))
    assert np.abs(V - V_ref).max() < 1e-8


def test_projector_on_center_completeness():
    """For AOs sitting ON the ECP center, the l-projector is exact:
    an s AO is pure l=0, a p AO pure l=1 -- so the semilocal l-channel
    with potential U reproduces the local U on that block and kills the
    other."""
    mol = Mole(atom="Ne 0 0 0", basis="sto-3g")  # 1 center: 2s + 1p shell
    terms = [(2, 0.9, 1.7)]
    V_loc = ecp_matrix(mol, {"Ne": ECPData(ncore=0, local=terms)})
    V_l0 = ecp_matrix(
        mol, {"Ne": ECPData(ncore=0, semilocal={0: terms})}
    )
    V_l1 = ecp_matrix(
        mol, {"Ne": ECPData(ncore=0, semilocal={1: terms})}
    )
    s = slice(0, 2)
    p = slice(2, 5)
    assert np.abs(V_l0[s, s] - V_loc[s, s]).max() < 1e-9
    assert np.abs(V_l0[p, p]).max() < 1e-9
    assert np.abs(V_l1[p, p] - V_loc[p, p]).max() < 1e-9
    assert np.abs(V_l1[s, s]).max() < 1e-9
    assert np.abs(V_l0 + V_l1 - V_loc).max() < 1e-8  # s+p complete here


def test_grid_convergence():
    mol = Mole(atom="H 0 0 0; H 0 0 0.9", basis="sto-3g")
    spec = {"H": ECPData(ncore=0, local=[(2, 1.1, 1.0), (1, 2.0, 0.5)],
                         semilocal={0: [(2, 1.6, 0.8)]})}
    V1 = ecp_matrix(mol, spec)
    V2 = ecp_matrix(mol, spec, n_rad=200, n_theta=20, n_phi=40)
    assert np.abs(V1 - V2).max() < 1e-8


# a synthetic 2-electron-core carbon pseudopotential: physically
# arbitrary (no tabulated data ships offline) but well-defined, which is
# all the pipeline invariants need.
_PSEUDO_C = {
    "C": {
        "ncore": 2,
        "local": [(2, 4.5, 8.0), (1, 2.8, 2.0)],
        "semilocal": {0: [(2, 6.0, 10.0)]},
    }
}


def test_ecp_rhf_and_be_hf_in_hf():
    """Full pipeline with an ECP: Z_eff/electron count, RHF convergence,
    and the BE HF-in-HF invariant (the reference's own built-in check,
    mbe.py:1171-1180) on propane BE1."""
    from quemb_tpu import BE, fragmentate
    from quemb_tpu.chem.scf import RHF

    atoms = (
        "C 0 0 0; C 1.26 0.86 0; C 2.52 0 0;"
        "H -0.55 0.94 0; H -0.55 -0.55 0.8; H -0.55 -0.55 -0.8;"
        "H 1.26 1.5 0.88; H 1.26 1.5 -0.88;"
        "H 3.07 0.94 0; H 3.07 -0.55 0.8; H 3.07 -0.55 -0.8"
    )
    mol = Mole(atom=atoms, basis="sto-3g", ecp=_PSEUDO_C)
    assert mol.nelectron == 3 * 4 + 8  # 3 C_eff(4e) + 8 H
    mf = RHF(mol, conv_tol=1e-11)
    mf.kernel()
    assert mf.converged
    fobj = fragmentate(mol=mol, n_BE=1, frag_type="chemgen",
                       print_frags=False)
    mybe = BE(mf, fobj)
    assert abs(mybe.ebe_hf - mf.e_tot) < 1e-6
