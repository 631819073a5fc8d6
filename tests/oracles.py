"""Dense NumPy oracles for kernel verification.

Mirrors the reference's dense-reference test pattern
(reference: test/coreop.jl:8-16,121-127): every jitted kernel is checked
against a brute-force dense evaluation on small random problems.
"""

from __future__ import annotations

import numpy as np

from sdplrplus_tpu.problem import SDPProblem


def dense_ops(prob: SDPProblem):
    """[A_0, ..., A_{m-1}, C] as dense arrays."""
    return [A.todense() for A in prob.As] + [prob.C.todense()]


def dense_primal_vio(prob: SDPProblem, R: np.ndarray) -> np.ndarray:
    """Length m+1: slots 0..m-1 = <A_i, RRT> - b_i, slot m = <C, RRT>
    (reference: test/coreop.jl:8-16)."""
    X = R @ R.T
    ops = dense_ops(prob)
    out = np.array([np.sum(Ai * X) for Ai in ops])
    out[: prob.m] -= prob.b
    return out


def dense_al(prob: SDPProblem, R: np.ndarray, lam: np.ndarray, sigma: float):
    """Sharp augmented Lagrangian (reference: src/coreop.jl:11-31)."""
    pv = dense_primal_vio(prob, R)
    obj = pv[prob.m]
    v = pv[: prob.m]
    lam_ub = np.where(prob.constraint_types, 0.0, np.inf)
    lam_t = np.minimum(lam_ub, lam - sigma * v)
    return obj + np.sum(lam_t**2 - lam**2) / (2.0 * sigma)


def dense_S(prob: SDPProblem, y_full: np.ndarray) -> np.ndarray:
    """S = sum_i y_i A_i + y_m C (reference: test/coreop.jl:121-127)."""
    ops = dense_ops(prob)
    return sum(y_full[i] * ops[i] for i in range(prob.m + 1))


def fd_gradient(prob: SDPProblem, R: np.ndarray, lam, sigma, h=1e-6):
    """Central finite differences of the dense AL w.r.t. R."""
    g = np.zeros_like(R)
    for i in range(R.shape[0]):
        for j in range(R.shape[1]):
            Rp = R.copy(); Rp[i, j] += h
            Rm = R.copy(); Rm[i, j] -= h
            g[i, j] = (dense_al(prob, Rp, lam, sigma) - dense_al(prob, Rm, lam, sigma)) / (2 * h)
    return g
