"""UBE one-shot hexene baselines (frozen core).

The reference's hexene numbers (ube-oneshot_test.py:31-61) are gated
known-to-fail upstream: its unrestricted frozen-core assembly omits the
per-spin core-potential folding, leaving an ~60 Ha HF-in-HF
inconsistency.  This framework folds the core potential per spin
(ube.py), so the built-in invariant holds (~1e-8) and the values below
are this framework's own recorded baselines (2026-08-16)."""

import os

import numpy as np
import pytest

from quemb_tpu import fragmentate
from quemb_tpu.chem.mole import Mole
from quemb_tpu.chem.scf import UHF
from quemb_tpu.ube import UBE

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.mark.skipif(
    os.environ.get("QUEMB_TPU_EXPENSIVE_TESTS", "").lower() != "true",
    reason="hexene-scale UCCSD on the single-core CPU",
)
def test_ube_hexene_anion_frozen_core():
    mol = Mole.from_xyz_file(
        os.path.join(DATA, "xyz", "hexene.xyz"), basis="sto-3g",
        charge=-1, spin=1,
    )
    mf = UHF(mol, conv_tol=1e-10)
    mf.kernel()
    recorded = {1: -0.13440829, 2: -0.22957541}
    for n_BE, e_ref in recorded.items():
        fobj = fragmentate(
            mol=mol, n_BE=n_BE, frag_type="chemgen", frozen_core=True,
            print_frags=False,
        )
        ube = UBE(mf, fobj)
        assert abs(ube.hf_etot - ube.ebe_hf) < 1e-6  # the invariant
        ube.oneshot(solver="UCCSD")
        assert np.isclose(ube.ebe_tot - ube.ebe_hf, e_ref, atol=1e-6)
