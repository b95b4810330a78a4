"""Lowdin (symmetric) orthogonalization (reference mbe.py:1395-1449)."""

from __future__ import annotations

import jax.numpy as jnp

from quemb_tpu.ops.linalg import eigh as _eigh


def lowdin_orth(S, tol: float = 1e-15):
    """W = V s^{-1/2} V^T over the non-singular eigenspace of S."""
    s, V = _eigh(S)
    keep = s > tol
    # zero out singular directions instead of boolean indexing (jit-friendly)
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, s, 1.0)), 0.0)
    return (V * inv_sqrt) @ V.T


def lowdin_localize(S, C):
    """Localized-orbital coefficients in the Lowdin AO basis: W^T S C."""
    W = lowdin_orth(S)
    return W, W.T @ S @ C
