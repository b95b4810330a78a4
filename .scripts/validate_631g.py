"""Validate / regenerate 6-31G tables for F, Ne and the second row (Na-Ar).

6-31G (Hehre-Ditchfield-Pople 1972; second row: Francl et al., JCP 77,
3654 (1982)) is an atomic-HF-energy-optimized segmented basis: a
6-primitive core s, a shared-exponent 6-primitive inner sp, and a 3+1
split valence sp.  Both the exponents and the segmented contraction
coefficients are variational parameters of the atomic ground-state
restricted open-shell HF energy under that structure.

This script validates candidate tables (recalled published values) by
  1. solving the atomic ROHF ground state in the candidate basis,
  2. re-optimizing the contraction coefficients at fixed exponents
     (they should be stationary already if the candidate is genuine),
  3. measuring the energy gradient w.r.t. the shared log-exponents
     (near-zero for genuinely optimized published exponents),
  4. optionally re-optimizing everything (--fit) when a candidate fails.

The atomic solver is a Roothaan single-open-shell HF with coupling
operators, which (unlike .scripts/refit_ccpvdz.py) supports closed and
open shells in the SAME symmetry block -- required for the second row
(open 3s over closed 1s/2s for Na; open 3p over closed 2p for Al-Cl).

Run on CPU: JAX_PLATFORMS=cpu python .scripts/validate_631g.py S Cl ...
"""

import sys

import numpy as np
import scipy.linalg
import scipy.optimize

sys.path.insert(0, ".")

from quemb_tpu.chem import integrals  # noqa: E402
from quemb_tpu.chem.mole import Mole  # noqa: E402

# Roothaan single-open-shell coupling constants (f, a, b) and closed
# counts (n closed s orbitals, n closed p radial shells), open shell l.
ATOMS = {
    "F":  dict(ncs=2, ncp=0, lo=1, f=5 / 6, a=24 / 25, b=24 / 25),
    "Ne": dict(ncs=2, ncp=1, lo=None, f=0, a=0, b=0),
    "Na": dict(ncs=2, ncp=1, lo=0, f=1 / 2, a=0, b=0),
    "Mg": dict(ncs=3, ncp=1, lo=None, f=0, a=0, b=0),
    "Al": dict(ncs=3, ncp=1, lo=1, f=1 / 6, a=0, b=0),
    "Si": dict(ncs=3, ncp=1, lo=1, f=1 / 3, a=3 / 4, b=3 / 2),
    "P":  dict(ncs=3, ncp=1, lo=1, f=1 / 2, a=1.0, b=2.0),
    "S":  dict(ncs=3, ncp=1, lo=1, f=2 / 3, a=15 / 16, b=9 / 8),
    "Cl": dict(ncs=3, ncp=1, lo=1, f=5 / 6, a=24 / 25, b=24 / 25),
    "Ar": dict(ncs=3, ncp=2, lo=None, f=0, a=0, b=0),
}


def atom_rohf(sym, shells, max_iter=400, damp=0.35):
    """Ground-state Roothaan single-open-shell HF for a free atom.

    shells: [(l, [(exp, coef), ...]), ...]  (contracted, cartesian).
    Returns (E, Cs, Cp, es, ep): s/p-block orbital coefficient matrices
    (radial, one p component) and eigenvalues of the effective Fock.
    """
    cfg = ATOMS[sym]
    mol = Mole(atom=[(sym, [0.0, 0.0, 0.0])], basis={sym: shells},
               unit="bohr", cart=True)
    S = integrals.overlap(mol)
    h = integrals.core_hamiltonian(mol)
    eri = integrals.eri_full(mol)
    n = S.shape[0]
    # AO layout: grouped by l at build time -> all s first, then p as
    # (shell-major, component-minor) triples.  Recover indices from the
    # diagonal structure: s AOs have no angular nodes; simplest is to
    # rebuild the layout from the shells list.
    ns = sum(1 for l, _ in shells if l == 0)
    np_sh = sum(1 for l, _ in shells if l == 1)
    assert n == ns + 3 * np_sh
    s_idx = np.arange(ns)
    # p component x of each p shell: ns + 3*k
    px_idx = ns + 3 * np.arange(np_sh)

    def JK(D):
        return (np.einsum("pqrs,rs->pq", eri, D),
                np.einsum("prqs,rs->pq", eri, D))

    Ss = S[np.ix_(s_idx, s_idx)]
    # initial guess: core-Hamiltonian orbitals per symmetry block
    Cs = scipy.linalg.eigh(h[np.ix_(s_idx, s_idx)], Ss)[1]
    if np_sh:
        Spp = S[np.ix_(px_idx, px_idx)]
        Cp = scipy.linalg.eigh(h[np.ix_(px_idx, px_idx)], Spp)[1]
    else:
        Cp = np.zeros((0, 0))

    f, a, b = cfg["f"], cfg["a"], cfg["b"]
    ncs, ncp, lo = cfg["ncs"], cfg["ncp"], cfg["lo"]

    def densities(Cs, Cp):
        Dc = np.zeros((n, n))
        Do = np.zeros((n, n))
        for k in range(ncs):
            v = np.zeros(n)
            v[s_idx] = Cs[:, k]
            Dc += 2.0 * np.outer(v, v)
        for k in range(ncp):
            for m in range(3):
                idx = ns + 3 * np.arange(np_sh) + m
                v = np.zeros(n)
                v[idx] = Cp[:, k]
                Dc += 2.0 * np.outer(v, v)
        if lo == 0:  # open s shell (e.g. Na 3s), f = 1/2
            v = np.zeros(n)
            v[s_idx] = Cs[:, ncs]
            Do += 2.0 * f * np.outer(v, v)
        elif lo == 1:  # open p shell, spherically averaged
            for m in range(3):
                idx = ns + 3 * np.arange(np_sh) + m
                v = np.zeros(n)
                v[idx] = Cp[:, ncp]
                Do += 2.0 * f * np.outer(v, v)
        return Dc, Do

    Dc, Do = densities(Cs, Cp)
    E_last = None
    for it in range(max_iter):
        Jc, Kc = JK(Dc)
        Jo, Ko = JK(Do)
        Fc = h + (Jc - 0.5 * Kc) + (Jo - 0.5 * Ko)
        if f > 0:
            # dE/dDo with Po = Do/(2f):  h + G[Dc] + a*J[Po]... written
            # via Jo = 2f*J[Po]:  Fo = h + G[Dc] + (a*Jo - b/2*Ko)/(2f)*2f/...
            Fo = h + (Jc - 0.5 * Kc) + (2 * a * Jo - b * Ko) / (2.0)
            # NOTE: with Do = 2f*Po, J[Po] = Jo/(2f):
            #   f*(2a*J[Po] - b*K[Po]) = (2a*Jo - b*Ko)/2 ... wait:
            #   f * (2a*Jo/(2f) - b*Ko/(2f)) = (2a*Jo - b*Ko)/2  ✓
        else:
            Fo = Fc
        E = (np.einsum("pq,pq->", Dc + Do, h)
             + 0.5 * np.einsum("pq,pq->", Dc, Jc - 0.5 * Kc)
             + np.einsum("pq,pq->", Do, Jc - 0.5 * Kc)
             + 0.25 * np.einsum("pq,pq->", Do, 2 * a * Jo - b * Ko) / 1.0
             if f > 0 else
             np.einsum("pq,pq->", Dc, h)
             + 0.5 * np.einsum("pq,pq->", Dc, Jc - 0.5 * Kc))
        # effective Fock with coupling operators per symmetry block
        def eff_block(F_c, F_o, C, ncl, has_open):
            nb = C.shape[0]
            if not has_open:
                return F_c
            Pc = C[:, :ncl] @ C[:, :ncl].T
            Po = np.outer(C[:, ncl], C[:, ncl])
            Sb = Ss if nb == ns else Spp
            Pv = np.linalg.inv(Sb) - Pc - Po
            # projectors act through S in a nonorthogonal basis
            def sand(P, F, Q):
                return Sb @ P @ F @ Q @ Sb
            Fco = (F_c - f * F_o) / (1.0 - f)
            return (sand(Pc, F_c, Pc) + sand(Po, F_o, Po)
                    + sand(Pv, F_c, Pv)
                    + sand(Pc, Fco, Po) + sand(Po, Fco, Pc)
                    + sand(Pc, F_c, Pv) + sand(Pv, F_c, Pc)
                    + sand(Po, F_o, Pv) + sand(Pv, F_o, Po))

        Fcs = Fc[np.ix_(s_idx, s_idx)]
        Fos = Fo[np.ix_(s_idx, s_idx)]
        Fs_eff = eff_block(Fcs, Fos, Cs, ncs, lo == 0)
        es, Cs_new = scipy.linalg.eigh(Fs_eff, Ss)
        if np_sh:
            Fcp = Fc[np.ix_(px_idx, px_idx)]
            Fop = Fo[np.ix_(px_idx, px_idx)]
            Fp_eff = eff_block(Fcp, Fop, Cp, ncp, lo == 1)
            ep, Cp_new = scipy.linalg.eigh(Fp_eff, Spp)
        else:
            ep, Cp_new = np.zeros(0), Cp
        Cs, Cp = Cs_new, Cp_new
        Dc_new, Do_new = densities(Cs, Cp)
        Dc = (1 - damp) * Dc_new + damp * Dc
        Do = (1 - damp) * Do_new + damp * Do
        if E_last is not None and abs(E - E_last) < 1e-12 and it > 8:
            break
        E_last = E
    return E, Cs, Cp, es, ep


# Real-determinant UHF occupations: (n alpha s, n beta s, alpha p occ
# per [shell][component], same for beta) with integer occupations (the
# actual cartesian ground determinant, e.g. C 2px^1 2py^1).  Pople's
# basis optimizations used UHF atomic ground states
# (Hehre-Ditchfield-Pople 1972; Francl et al. 1982), so published 6-31G
# parameters should be stationary under THIS functional, not Roothaan's
# spherically-averaged ROHF.
UHF_OCC = {
    "C":  (2, 2, [[1, 1, 0]], [[0, 0, 0]]),
    "N":  (2, 2, [[1, 1, 1]], [[0, 0, 0]]),
    "O":  (2, 2, [[1, 1, 1]], [[1, 0, 0]]),
    "F":  (2, 2, [[1, 1, 1]], [[1, 1, 0]]),
    "Ne": (2, 2, [[1, 1, 1]], [[1, 1, 1]]),
    "Na": (3, 2, [[1, 1, 1]], [[1, 1, 1]]),
    "Mg": (3, 3, [[1, 1, 1]], [[1, 1, 1]]),
    "Al": (3, 3, [[1, 1, 1], [1, 0, 0]], [[1, 1, 1], [0, 0, 0]]),
    "Si": (3, 3, [[1, 1, 1], [1, 1, 0]], [[1, 1, 1], [0, 0, 0]]),
    "P":  (3, 3, [[1, 1, 1], [1, 1, 1]], [[1, 1, 1], [0, 0, 0]]),
    "S":  (3, 3, [[1, 1, 1], [1, 1, 1]], [[1, 1, 1], [1, 0, 0]]),
    "Cl": (3, 3, [[1, 1, 1], [1, 1, 1]], [[1, 1, 1], [1, 1, 0]]),
    "Ar": (3, 3, [[1, 1, 1], [1, 1, 1]], [[1, 1, 1], [1, 1, 1]]),
}


def atom_uhf(sym, shells, max_iter=500, damp=0.3):
    """Real-determinant (cartesian integer-occupation) UHF for a free atom."""
    nsa, nsb, pa, pb = UHF_OCC[sym]
    mol = Mole(atom=[(sym, [0.0, 0.0, 0.0])], basis={sym: shells},
               unit="bohr", cart=True)
    S = integrals.overlap(mol)
    h = integrals.core_hamiltonian(mol)
    eri = integrals.eri_full(mol)
    n = S.shape[0]
    ns = sum(1 for l, _ in shells if l == 0)
    np_sh = sum(1 for l, _ in shells if l == 1)
    s_idx = np.arange(ns)
    px_idx = ns + 3 * np.arange(np_sh)
    Ss = S[np.ix_(s_idx, s_idx)]
    pm_idx = [ns + 3 * np.arange(np_sh) + m for m in range(3)]
    Spp = (S[np.ix_(pm_idx[0], pm_idx[0])] if np_sh else None)

    def dens(Cs, Cp_by_m, n_s, p_occ):
        D = np.zeros((n, n))
        for k in range(n_s):
            v = np.zeros(n)
            v[s_idx] = Cs[:, k]
            D += np.outer(v, v)
        for k, occs in enumerate(p_occ):
            for m, occ in enumerate(occs):
                if occ == 0:
                    continue
                v = np.zeros(n)
                v[pm_idx[m]] = Cp_by_m[m][:, k]
                D += occ * np.outer(v, v)
        return D

    Cs0 = scipy.linalg.eigh(h[np.ix_(s_idx, s_idx)], Ss)[1]
    Cp0 = (scipy.linalg.eigh(h[np.ix_(pm_idx[0], pm_idx[0])], Spp)[1]
           if np_sh else np.zeros((0, 0)))
    Csa = Csb = Cs0
    Cpa = [Cp0] * 3
    Cpb = [Cp0] * 3
    Da = dens(Csa, Cpa, nsa, pa)
    Db = dens(Csb, Cpb, nsb, pb)
    E_last = None
    for it in range(max_iter):
        J = np.einsum("pqrs,rs->pq", eri, Da + Db)
        Ka = np.einsum("prqs,rs->pq", eri, Da)
        Kb = np.einsum("prqs,rs->pq", eri, Db)
        Fa = h + J - Ka
        Fb = h + J - Kb
        E = (np.einsum("pq,pq->", Da + Db, h)
             + 0.5 * np.einsum("pq,pq->", Da + Db, J)
             - 0.5 * np.einsum("pq,pq->", Da, Ka)
             - 0.5 * np.einsum("pq,pq->", Db, Kb))
        _, Csa = scipy.linalg.eigh(Fa[np.ix_(s_idx, s_idx)], Ss)
        _, Csb = scipy.linalg.eigh(Fb[np.ix_(s_idx, s_idx)], Ss)
        if np_sh:
            Cpa = [scipy.linalg.eigh(
                Fa[np.ix_(pm_idx[m], pm_idx[m])], Spp)[1]
                for m in range(3)]
            Cpb = [scipy.linalg.eigh(
                Fb[np.ix_(pm_idx[m], pm_idx[m])], Spp)[1]
                for m in range(3)]
        Da_new = dens(Csa, Cpa, nsa, pa)
        Db_new = dens(Csb, Cpb, nsb, pb)
        Da = (1 - damp) * Da_new + damp * Da
        Db = (1 - damp) * Db_new + damp * Db
        if E_last is not None and abs(E - E_last) < 1e-12 and it > 8:
            break
        E_last = E
    return E


FUNCTIONAL = "uhf"


def energy(sym, shells):
    if FUNCTIONAL == "uhf":
        return atom_uhf(sym, shells)
    return atom_rohf(sym, shells)[0]


# ----------------------------------------------------------------------
# Candidate tables (recalled published 6-31G data; validated below).
# Format matches quemb_tpu.chem.basis_data._631G.
# ----------------------------------------------------------------------
def sp(exps, scoefs, pcoefs):
    return [(0, list(zip(exps, scoefs))), (1, list(zip(exps, pcoefs)))]


CANDIDATES = {
    "F": (
        [(0, [(7001.71309, 0.00181962), (1051.36609, 0.01391608),
              (239.28569, 0.06840532), (73.31458, 0.23318576),
              (23.34040, 0.47126744), (7.80240, 0.35661855)])]
        + sp([20.84795, 4.80830, 1.34407],
             [-0.10850697, -0.14645166, 1.12868858],
             [0.07162872, 0.34591210, 0.72246996])
        + sp([0.358151], [1.0], [1.0])
    ),
    "Ne": (
        [(0, [(8425.85153, 0.00178853), (1268.51940, 0.01376419),
              (289.62141, 0.06832636), (87.36954, 0.23232843),
              (27.85389, 0.47100539), (9.28283, 0.35855990)])]
        + sp([26.53213, 6.10176, 1.69627],
             [-0.10711829, -0.14616382, 1.12777350],
             [0.07190958, 0.34951337, 0.71994051])
        + sp([0.44582], [1.0], [1.0])
    ),
    "Na": (
        [(0, [(9993.20, 0.00193766), (1499.89, 0.01480700),
              (341.951, 0.07270550), (94.6797, 0.25262900),
              (29.7345, 0.49324200), (10.0063, 0.31316900)])]
        + sp([150.963, 35.5878, 11.1683, 3.90201, 1.38177, 0.466382],
             [-0.00354208, -0.04395880, -0.10975200, 0.18739800,
              0.64669900, 0.30605800],
             [0.00500166, 0.03551090, 0.14282500, 0.33862000,
              0.45157900, 0.27327100])
        + sp([0.497966, 0.0843529, 0.0666350],
             [-0.24850300, -0.13170400, 1.23352000],
             [-0.02302250, 0.95035900, 0.05985790])
        + sp([0.0259544], [1.0], [1.0])
    ),
    "Mg": (
        [(0, [(11722.8, 0.00197783), (1759.93, 0.01511400),
              (400.846, 0.07391080), (112.807, 0.24919100),
              (35.9997, 0.48792800), (12.1828, 0.31966200)])]
        + sp([189.180, 45.2119, 14.3563, 5.13886, 1.90652, 0.705887],
             [-0.00323717, -0.04100790, -0.11260000, 0.14863300,
              0.61649700, 0.36482900],
             [0.00492813, 0.03498880, 0.14072500, 0.33364200,
              0.44494000, 0.26925400])
        + sp([0.929340, 0.269035, 0.117379],
             [-0.21229000, -0.10798500, 1.17584000],
             [-0.02241918, 0.19270550, 0.84618200])
        + sp([0.0421061], [1.0], [1.0])
    ),
    "Al": (
        [(0, [(13983.1, 0.00194267), (2098.75, 0.01485990),
              (477.705, 0.07284940), (134.360, 0.24683000),
              (42.8709, 0.48725800), (14.5189, 0.32349600)])]
        + sp([239.668, 57.4419, 18.2859, 6.59914, 2.49049, 0.944545],
             [-0.00292619, -0.03740830, -0.11448700, 0.11563500,
              0.61259500, 0.39379900],
             [0.00460285, 0.03319900, 0.13628200, 0.33047600,
              0.44914600, 0.26570400])
        + sp([1.27790, 0.397590, 0.160095],
             [-0.22760600, 0.00144583, 1.09279000],
             [-0.01751380, 0.24453300, 0.80493400])
        + sp([0.0556577], [1.0], [1.0])
    ),
    "Si": (
        [(0, [(16115.9, 0.00195948), (2425.58, 0.01492880),
              (553.867, 0.07284780), (156.340, 0.24613000),
              (50.0683, 0.48591400), (17.0178, 0.32500200)])]
        + sp([292.718, 69.8731, 22.3363, 8.15039, 3.13458, 1.22543],
             [-0.00278094, -0.03571460, -0.11498500, 0.09356340,
              0.60301700, 0.41895900],
             [0.00443826, 0.03266790, 0.13472100, 0.32867800,
              0.44964000, 0.26137200])
        + sp([1.72738, 0.572922, 0.222192],
             [-0.24463000, 0.00431572, 1.09818000],
             [-0.01779830, 0.25353900, 0.80066900])
        + sp([0.0778369], [1.0], [1.0])
    ),
    "P": (
        [(0, [(19413.3, 0.00185160), (2909.42, 0.01420620),
              (661.364, 0.06999950), (185.759, 0.24007900),
              (59.1943, 0.48476200), (20.0310, 0.33520000)])]
        + sp([339.478, 81.0101, 25.8780, 9.45221, 3.66566, 1.46746],
             [-0.00278217, -0.03604990, -0.11663100, 0.09683280,
              0.61441800, 0.40379800],
             [0.00456462, 0.03369360, 0.13975500, 0.33936200,
              0.45092100, 0.23858600])
        + sp([2.15623, 0.748997, 0.283145],
             [-0.25292300, 0.03285170, 1.08125000],
             [-0.01776530, 0.27405800, 0.78542100])
        + sp([0.0998317], [1.0], [1.0])
    ),
    "S": (
        [(0, [(21917.1, 0.00186924), (3301.49, 0.01423030),
              (754.146, 0.06969620), (212.711, 0.23848700),
              (67.9896, 0.48330700), (23.0515, 0.33807400)])]
        + sp([423.735, 100.710, 32.1599, 11.8079, 4.63110, 1.87025],
             [-0.00237677, -0.03169300, -0.11331700, 0.05609000,
              0.59225500, 0.45500600],
             [0.00406101, 0.03068130, 0.13045200, 0.32720500,
              0.45285100, 0.25604200])
        + sp([2.61584, 1.02247, 0.429287],
             [-0.25037400, 0.06695700, 1.05451000],
             [-0.01451050, 0.31026300, 0.78660300])
        + sp([0.147333], [1.0], [1.0])
    ),
    "Cl": (
        [(0, [(25180.1, 0.00183296), (3780.35, 0.01403420),
              (860.474, 0.06909740), (242.145, 0.23745200),
              (77.3349, 0.48303400), (26.2470, 0.33985600)])]
        + sp([491.765, 116.984, 37.4153, 13.7834, 5.45215, 2.22588],
             [-0.00229739, -0.03071370, -0.11252800, 0.04501630,
              0.58935300, 0.46520600],
             [0.00398940, 0.03031770, 0.12988000, 0.32795100,
              0.45352700, 0.25215400])
        + sp([3.18649, 1.14427, 0.420377],
             [-0.25183000, 0.06158900, 1.06018000],
             [-0.01429930, 0.32357200, 0.74350700])
        + sp([0.142657], [1.0], [1.0])
    ),
    "Ar": (
        [(0, [(28348.3, 0.00182526), (4257.62, 0.01396860),
              (969.857, 0.06870730), (273.263, 0.23720400),
              (87.3695, 0.48221400), (29.6867, 0.34204300)])]
        + sp([575.891, 136.816, 43.8098, 16.1442, 6.37084, 2.59760],
             [-0.00215972, -0.02907750, -0.11082700, 0.02769990,
              0.57761300, 0.48868800],
             [0.00380665, 0.02923050, 0.12646700, 0.32351000,
              0.45489600, 0.25663000])
        + sp([3.86028, 1.41373, 0.516646],
             [-0.25559200, 0.03780660, 1.08056000],
             [-0.01591970, 0.32464600, 0.74399000])
        + sp([0.173888], [1.0], [1.0])
    ),
}


def shells_to_params(shells):
    """Flatten to (log-exponent vector, coefficient vector, spec)."""
    # group into segments: (kind, n_prim) where kind in {"s","sp"}
    segs = []
    i = 0
    while i < len(shells):
        l, prims = shells[i]
        if (l == 0 and i + 1 < len(shells) and shells[i + 1][0] == 1
                and [e for e, _ in shells[i + 1][1]]
                == [e for e, _ in prims]):
            segs.append(("sp", prims, shells[i + 1][1]))
            i += 2
        else:
            segs.append(("s" if l == 0 else "p", prims, None))
            i += 1
    return segs


def params_vector(segs, with_coefs=True):
    xs, spec = [], []
    for kind, prims, pprims in segs:
        exps = [e for e, _ in prims]
        xs.extend(np.log(exps))
        spec.append((kind, len(exps)))
        if with_coefs and len(exps) > 1:
            xs.extend([c for _, c in prims])
            if kind == "sp":
                xs.extend([c for _, c in pprims])
    return np.array(xs), spec


def rebuild(segs, x, with_coefs=True):
    shells = []
    i = 0
    for kind, prims, pprims in segs:
        npr = len(prims)
        exps = np.exp(x[i:i + npr])
        i += npr
        if with_coefs and npr > 1:
            sc = x[i:i + npr]
            i += npr
            if kind == "sp":
                pc = x[i:i + npr]
                i += npr
        else:
            sc = np.array([c for _, c in prims])
            pc = (np.array([c for _, c in pprims])
                  if pprims is not None else None)
        shells.append((0, list(zip(exps, sc))))
        if kind == "sp":
            if not (with_coefs and npr > 1):
                pc = np.array([c for _, c in pprims])
            shells.append((1, list(zip(exps, pc))))
    return shells


def validate(sym, fit=False):
    """Numerical stationarity check of the candidate table.

    The published 6-31G parameters are the minimizer of the atomic ROHF
    energy under the segmented structure, so at a genuine table the
    gradient w.r.t. every free parameter (log-exponents AND contraction
    coefficients) vanishes up to publication rounding.  A wrong recalled
    number shows up as a large gradient component at its index.
    """
    shells = CANDIDATES[sym]
    segs = shells_to_params(shells)
    E0 = energy(sym, shells)
    print(f"== {sym}: E(candidate) = {E0:.8f} Ha", flush=True)

    x0, _ = params_vector(segs, with_coefs=True)
    nexp = sum(len(p) for _, p, _ in segs)
    g = np.zeros(len(x0))
    eps = 2e-4
    for k in range(len(x0)):
        xp = x0.copy(); xp[k] += eps
        xm = x0.copy(); xm[k] -= eps
        g[k] = (energy(sym, rebuild(segs, xp))
                - energy(sym, rebuild(segs, xm))) / (2 * eps)
    ge, gc = g[:nexp], g[nexp:]
    print(f"   dE/dlog(zeta): max |g| = {np.abs(ge).max():.2e} "
          f"(rms {np.sqrt((ge**2).mean()):.2e})", flush=True)
    print(f"   dE/dcoef     : max |g| = {np.abs(gc).max():.2e} "
          f"(rms {np.sqrt((gc**2).mean()):.2e})", flush=True)
    bad = np.where(np.abs(g) > 3e-3)[0]
    if len(bad):
        print(f"   suspect param indices (|g|>3e-3): {bad.tolist()}")
        print(f"   g[bad] = {[f'{g[k]:.1e}' for k in bad]}")

    if fit:
        res = scipy.optimize.minimize(
            lambda x: energy(sym, rebuild(segs, x)), x0,
            method="Powell",
            options=dict(maxiter=20000, xtol=1e-8, ftol=1e-12))
        print(f"   full re-opt: E = {res.fun:.8f} "
              f"(gain {E0 - res.fun:.2e})")
        final = rebuild(segs, res.x)
        print("   optimized shells:")
        for l, prims in final:
            print(f"     ({l}, "
                  f"{[(round(e, 7), round(c, 8)) for e, c in prims]}),")
    return E0, np.abs(g).max()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    fit = "--fit" in sys.argv
    for sym in args or ["S"]:
        validate(sym, fit=fit)
