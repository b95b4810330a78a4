"""Quasi-Newton optimizer for BE matching conditions.

Reimplementation of the reference's FrankQN machinery
(``shared/external/optqn.py``): Broyden inverse updates in product form,
Li-Fukushima line search, and a dog-leg trust region.  The optimizer state is
tiny (n_conditions ~ tens), so this runs host-side in numpy; each objective
evaluation it triggers is the fully jitted fragment-solve pass.
"""

from __future__ import annotations

import logging

import numpy as np
from numpy.linalg import inv, norm, pinv

logger = logging.getLogger(__name__)


def line_search_LF(func, xold, fold, dx, iter_):
    """Li-Fukushima derivative-free line search (optqn.py:25)."""
    beta, rho = 0.1, 0.9
    sigma1 = sigma2 = 1e-3
    eta = (iter_ + 1) ** -2.0

    xk = xold + dx
    fk = func(xk)
    lcout = 1
    norm_dx = norm(dx)
    norm_fk = norm(fk)
    norm_fold = norm(fold)
    alp = 1.0
    if norm_fk > rho * norm_fold - sigma2 * norm_dx**2:
        while norm_fk > (1.0 + eta) * norm_fold - sigma1 * alp**2 * norm_dx**2:
            alp *= beta
            xk = xold + alp * dx
            fk = func(xk)
            lcout += 1
            norm_fk = norm(fk)
            if lcout == 20:
                break
    logger.info(f"line search steps in QN opt: {lcout}")
    return alp, xk, fk


def trust_region(func, xold, fold, Binv, c=0.5):
    """Broyden trust-region step via the dog-leg method (optqn.py:62)."""
    microiter = 0
    rho = 0.001
    ratio = 0.0
    B = inv(Binv)
    dx_gn = -(Binv @ Binv.T) @ B.T @ fold
    dx_sd = -B.T @ fold
    t = norm(dx_sd) ** 2 / norm(B @ dx_sd) ** 2
    prevdx = None
    ared = 0.0
    fnew = fold
    while ratio < rho or ared < 0.0:
        radius = max(1.0, norm(xold)) * c**microiter
        if norm(dx_gn) < radius:
            dx = dx_gn
        elif t * norm(dx_sd) > radius:
            dx = (c**microiter) / norm(dx_sd) * dx_sd
        else:
            tdx_sd = t * dx_sd
            diff = dx_gn - tdx_sd
            s = 1.0
            dx = tdx_sd + s * diff
            while norm(dx) > c**microiter and s > 0:
                s -= 0.001
                dx = tdx_sd + s * diff
        if prevdx is None or not np.array_equal(dx, prevdx):
            fnew = func(xold + dx)
            ared = 0.5 * (norm(fold) ** 2 - norm(fnew) ** 2)
            pred = 0.5 * (norm(fold) ** 2 - norm(fold + B @ dx) ** 2)
        ratio = ared / pred
        microiter += 1
        prevdx = dx
    return xold + dx, fnew


class FrankQN:
    """Quasi-Newton loop with Broyden inverse updates (optqn.py:158)."""

    def __init__(self, func, x0, f0, J0, trust=0.5, max_space=500):
        self.x0 = np.asarray(x0, dtype=float)
        self.n = self.x0.size
        self.f0 = f0
        self.func = func
        self.B0 = pinv(J0)
        self.max_subspace = max_space
        self.dxs = np.empty((max_space, self.n))
        self.fs = np.empty((max_space, self.n))
        self.us = np.empty((max_space, self.n))
        self.vs = np.empty((max_space, self.n))
        self.trust = trust
        self.xnew = self.xold = self.fnew = self.fold = None
        self.Binv = None

    def next_step(self, it, trust_region_opt=False):
        if it == 0:
            self.xnew = self.x0
            self.fnew = self.func(self.xnew) if self.f0 is None else self.f0
            self.fs[0] = self.fnew.copy()
            self.us[0] = self.B0 @ self.fnew
            self.Binv = self.B0.copy()
        else:
            dx_i = self.xnew - self.xold
            df_i = self.fnew - self.fold

        self.xold = self.xnew.copy()
        self.fold = self.fnew.copy()

        if it != 0:
            self.Binv += np.outer(
                dx_i - self.Binv @ df_i, dx_i @ self.Binv
            ) / (dx_i @ self.Binv @ df_i)

        if trust_region_opt:
            self.xnew, self.fnew = trust_region(
                self.func, self.xold, self.fold, self.Binv, c=self.trust
            )
        else:
            self.us[it] = self.get_Bnfn(it)
            _, self.xnew, self.fnew = line_search_LF(
                self.func, self.xold, self.fold, -self.us[it], it
            )
            self.vs[it] = self.B0 @ self.fnew
        self.dxs[it] = self.xnew - self.xold
        if it + 1 < self.max_subspace:
            self.fs[it + 1] = self.fnew.copy()

    def get_Bnfn(self, n):
        """Product-form application of the Broyden inverse (optqn.py:227)."""
        if n == 0:
            return self.us[0]
        vs = [self.vs[n - i - 1] for i in range(n)]
        for i in range(1, n + 1):
            un_ = self.us[i - 1]
            dxn_ = self.dxs[i - 1]
            vps = []
            for j in range(n - i + 1):
                a = vs[j]
                b = vs[n - i] - un_
                vps.append(a + (dxn_ @ a) / (dxn_ @ b) * (dxn_ - b))
            vs = vps
        return vs[0]
