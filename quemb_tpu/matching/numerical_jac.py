"""Central-difference numerical Jacobian of the BE matching conditions.

Mirrors the reference ``molbe/numerical_jac.py:compute_numerical_jacobian``:
each condition's potential is perturbed and only the fragments that feel the
perturbation are re-solved; here every column is a (jitted) fragment-solve
pass, kept simple by re-solving all fragments (cheap once batched).
"""

from __future__ import annotations

import numpy as np

from quemb_tpu.solvers.dispatch import be_func


def compute_numerical_jacobian(
    be, solver: str, only_chem: bool, step_size: float = 1e-6
):
    pot0 = [0.0] if only_chem else list(be.pot)
    n = len(pot0)

    def errvec(pot):
        _, vec, _ = be_func(
            list(pot),
            be.fragments,
            be.Nocc,
            solver,
            only_chem=only_chem,
            eeval=False,
            return_vec=True,
        )
        return np.asarray(vec)

    J = np.zeros((n, n))
    for k in range(n):
        dp = np.array(pot0)
        dp[k] += step_size
        fp = errvec(dp)
        dp[k] -= 2 * step_size
        fm = errvec(dp)
        J[:, k] = (fp - fm) / (2 * step_size)
    return J
