"""Randomized rounding callbacks for benchmark quality metrics.

Equivalents of the reference's rounding procedures
(reference: exps/test.jl:71-106): 100 random-hyperplane cuts for MaxCut
and sorted balanced rounding for MinimumBisection.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def eval_cut(L: sp.spmatrix, x: np.ndarray) -> float:
    """0.25 · xᵀ L x (reference: exps/test.jl:72-75)."""
    return float(0.25 * x @ (L @ x))


def _laplacian(A: sp.spmatrix) -> sp.csr_matrix:
    d = np.asarray(A.sum(axis=1)).reshape(-1)
    return (sp.diags(d) - A).tocsr()


def maxcut_rounding(A: sp.spmatrix, R: np.ndarray, n_cuts: int = 100,
                    seed: int = 0) -> float:
    """Best of ``n_cuts`` random hyperplane cuts
    (reference: exps/test.jl:77-87). R is the n×r factor."""
    L = _laplacian(A)
    rng = np.random.default_rng(seed)
    r = R.shape[1]
    best = -np.inf
    for _ in range(n_cuts):
        z = np.sign(R @ rng.normal(size=r))
        z[z == 0] = 1.0
        best = max(best, eval_cut(L, z))
    return best


def minimum_bisection_rounding(A: sp.spmatrix, R: np.ndarray,
                               n_cuts: int = 100, seed: int = 0) -> float:
    """Best of ``n_cuts`` sorted balanced roundings
    (reference: exps/test.jl:89-106)."""
    L = _laplacian(A)
    rng = np.random.default_rng(seed)
    n, r = R.shape
    best = np.inf
    for _ in range(n_cuts):
        z = R @ rng.normal(size=r)
        perm = np.argsort(z)
        part = np.zeros(n)
        half = np.arange(1, n + 1) * 2 <= n
        part[perm] = half.astype(np.float64) * 2.0 - 1.0
        best = min(best, eval_cut(L, part))
    return best


def dummy_callback(A, R) -> float:
    return 0.0
