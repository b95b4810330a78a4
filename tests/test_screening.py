"""Screening layer: absolute overlap bound + Pallas screened transform.

Mirrors the reference's sparse-DF screening contract
(eri_sparse_DF.py:929 approx_S_abs, _cpp get_AO_per_MO + screened first
transform): S_abs bounds |S|, unreachable AO blocks can be skipped
without changing the transform."""

import numpy as np

import jax.numpy as jnp

from quemb_tpu.chem.integrals import overlap
from quemb_tpu.chem.mole import Mole
from quemb_tpu.ops.screening import (
    ao_reach_per_fragment,
    approx_S_abs,
    block_mask,
)


def _mol():
    return Mole(
        atom="; ".join(f"H 0 0 {i * 1.0}" for i in range(8)), basis="sto-3g"
    )


def test_s_abs_bounds_overlap():
    mol = _mol()
    S_abs = approx_S_abs(mol)
    S = overlap(mol)
    assert (S_abs + 1e-10 >= np.abs(S)).all()
    assert np.allclose(np.diag(S_abs), 1.0, atol=1e-8)
    # distant pairs screen to ~0
    assert S_abs[0, -1] < 1e-4


def test_screened_transform_matches_dense():
    from quemb_tpu.ops.df import DFTensor
    from quemb_tpu.ops.pallas_df import screened_first_transform

    mol = _mol()
    dft = DFTensor(mol)
    B = np.asarray(dft.B, np.float32)
    rng = np.random.default_rng(0)
    TA = rng.standard_normal((mol.nao, 5)).astype(np.float32)

    # full mask == dense transform
    reach = np.ones(mol.nao, dtype=bool)
    out = np.asarray(
        screened_first_transform(B, TA, reach, interpret=True)
    )
    ref = np.einsum("pmn,ni->pmi", B, TA)
    assert np.abs(out - ref).max() < 1e-4 * np.abs(ref).max()

    # a fragment-localized TA with a tight screen: skipped blocks change
    # nothing beyond the screening tolerance
    TA_loc = np.zeros((mol.nao, 2), np.float32)
    TA_loc[:2] = rng.standard_normal((2, 2))
    S_abs = approx_S_abs(mol)
    reach = ao_reach_per_fragment(S_abs, TA_loc, eps=1e-3)
    assert reach.sum() < mol.nao  # something actually screened out
    out = np.asarray(
        screened_first_transform(B, TA_loc, reach, interpret=True)
    )
    ref = np.einsum("pmn,ni->pmi", B, TA_loc)
    assert np.abs(out - ref).max() < 1e-4 * max(np.abs(ref).max(), 1.0)


def test_block_mask():
    reach = np.array([True] + [False] * 20)
    m = block_mask(reach, 16)
    assert m.tolist() == [True, False]


def test_pallas_screened_transform_on_chip():
    """Non-interpret Pallas execution of the screened first transform
    (run the suite with QUEMB_TPU_TESTS=1 on a TPU host; also exercised
    by bench.py every round).  Measured on v5e 2026-08-16: rel err
    7.3e-8 (f32)."""
    import jax
    import pytest

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (QUEMB_TPU_TESTS=1)")
    from quemb_tpu.ops.df import DFTensor
    from quemb_tpu.ops.pallas_df import screened_first_transform

    mol = _mol()
    dft = DFTensor(mol)
    B = np.asarray(dft.B, np.float32)
    rng = np.random.default_rng(0)
    TA = rng.standard_normal((mol.nao, 4)).astype(np.float32)
    reach = np.ones(mol.nao, bool)
    out = screened_first_transform(B, TA, reach, interpret=False)
    ref = np.einsum("pmn,ni->pmi", B, TA)
    assert np.abs(out - ref).max() < 5e-7 * np.abs(ref).max()


def test_sparse_df_f32_pallas_tier_matches_f64(monkeypatch):
    """The f32-pallas production tier (capacity runs,
    QUEMB_TPU_CCSD_F32_ONLY=1) reproduces the f64 screened transform to
    f32 precision, and BE selects it automatically under the flag."""
    from quemb_tpu.chem.scf import RHF
    from quemb_tpu.ops.sparse_df import SparseDF
    from quemb_tpu import BE, fragmentate

    mol = _mol()
    mf = RHF(mol, conv_tol=1e-12)
    mf.kernel()
    fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen",
                       print_frags=False)
    be = BE(mf, fobj)  # in-core reference fragments (for TAs)
    TAs = [fr.TA for fr in be.fragments]

    sdf64 = SparseDF(mol)
    sdf32 = SparseDF(mol, tier="f32-pallas")
    e64 = sdf64.transform_all(TAs)
    e32 = sdf32.transform_all(TAs)
    for a, b in zip(e64, e32):
        scale = max(np.abs(a).max(), 1.0)
        assert np.abs(a - b).max() / scale < 5e-6

    # end-to-end: BE picks the pallas tier under the capacity flag and
    # the one-shot energy stays within f32 distance of the f64 tier
    be_ref = BE(mf, fobj, int_transform="sparse-DF")
    be_ref.oneshot(solver="MP2")
    monkeypatch.setenv("QUEMB_TPU_CCSD_F32_ONLY", "1")
    be_f32 = BE(mf, fobj, int_transform="sparse-DF")
    be_f32.oneshot(solver="MP2")
    assert abs(be_ref.ebe_tot - be_f32.ebe_tot) < 5e-5
