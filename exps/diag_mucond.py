"""Diagnose the μ-conductance dual-bound stall (VERDICT r3 missing #2).

Runs a short μ-conductance solve on G1, then compares three dual bounds
at the final iterate:
  (a) the AL-iterate multiplier y = -min(λ_ub, λ - σv)  (what the solver
      reports today),
  (b) the generalized least-squares multiplier: minimize ‖S(y)R‖_F over
      ALL dual degrees of freedom (the ddᵀ multiplier in closed form via
      per-row projection; per-row diagonal totals w_i in closed form),
      with the equality/inequality split of w chosen to maximize the
      linear dual term -⟨y,b⟩ (a 1-D concave piecewise-linear max over
      the ⟨D,X⟩=1 multiplier),
  (c) same as (b) but with exact dense λ_min (scipy eigh) instead of the
      solver's Lanczos — isolates eigensolve quality from multiplier
      quality.

Usage: python exps/diag_mucond.py [--graph G1] [--maxtime 60]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import scipy.sparse as sp


def dual_value_mucond(L, d, volG, mu, R, tb, y2=None):
    """Generalized LS dual bound for the μ-conductance family, f64 dense.

    S(y) = L + y1·D + y2·ddᵀ + diag(z),  z free (ub/lb multiplier pairs),
    b = [1, 0, ub·1, -lb·1]. Returns (dual, lam_min, y1, y2, w)."""
    from sdplrplus_tpu.models import mu_conductance_lb, mu_conductance_ub

    n = L.shape[0]
    ub = mu_conductance_ub(volG, mu)
    lb = mu_conductance_lb(volG, mu)

    U = L @ R                        # (n, r)
    V = np.outer(d, d @ R) if y2 is None else None
    nrm = np.sum(R * R, axis=1)
    nrm = np.maximum(nrm, 1e-300)

    def rowproj(M):
        return M - (np.sum(M * R, axis=1) / nrm)[:, None] * R

    if y2 is None:
        PU, PV = rowproj(U), rowproj(V)
        denom = np.sum(PV * PV)
        y2 = -float(np.sum(PU * PV) / denom) if denom > 1e-300 else 0.0
    M = U + y2 * np.outer(d, d @ R)
    w = -np.sum(M * R, axis=1) / nrm   # optimal per-row diagonal total

    # split w_i = y1·d_i + z_i maximizing -y1 - ub·Σ z⁺ + lb·Σ z⁻
    # (concave piecewise-linear in y1; optimum at a breakpoint w_i/d_i)
    t = w / d
    order = np.argsort(t)
    ts, ds = t[order], d[order]
    # g'(y1) = -1 + ub·Σ_{t_i > y1} d_i + lb·Σ_{t_i < y1} d_i
    suf = np.concatenate([np.cumsum(ds[::-1])[::-1], [0.0]])  # Σ_{i>=k} d
    pre = np.concatenate([[0.0], np.cumsum(ds)])              # Σ_{i<k} d
    gp = -1.0 + ub * suf + lb * pre    # derivative just below breakpoint k
    k = int(np.searchsorted(-gp, 0.0))  # first k with gp <= 0
    y1 = float(ts[min(k, n - 1)])
    z = w - y1 * d
    lin = -y1 - ub * np.sum(np.maximum(z, 0)) + lb * np.sum(
        np.maximum(-z, 0))

    S = L.toarray() + y1 * np.diag(d) + y2 * np.outer(d, d) + np.diag(z)
    lam_min = float(np.linalg.eigvalsh(S)[0])
    dual = lin + tb * min(lam_min, 0.0)
    return dual, lam_min, y1, y2, w


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="G1")
    p.add_argument("--mu", type=float, default=0.1)
    p.add_argument("--maxtime", type=float, default=60.0)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--dtype", default=None)
    args = p.parse_args()

    from common import setup_jax_cache

    setup_jax_cache()

    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import mu_conductance_ineq, mu_conductance_ub
    from sdplrplus_tpu.models.problems import _laplacian
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    A = load_mat_adjacency(gset_path(args.graph, problem="MaxCut"))
    n = A.shape[0]
    d = np.asarray(A.sum(axis=1)).reshape(-1)
    volG = float(d.sum())
    L = _laplacian(A)
    ub = mu_conductance_ub(volG, args.mu)
    tb = n * ub

    C, As, b, ct = mu_conductance_ineq(A, args.mu)
    res = sdplr(C, As, b, args.rank, constraint_types=ct,
                prior_trace_bound=tb, ptol=1e-2, objtol=1e-2,
                maxtime=args.maxtime, dtype=args.dtype, dataset=args.graph,
                printlevel=1)
    R = res["R"]
    lam = res["lambda"]
    sigma = res["sigma"]
    print(f"\nsolver: obj={res['obj']:.6f} vio={res['primal_vio']:.2e} "
          f"max_dual={res['max_dual_value']:.6f} "
          f"gap={res['rel_duality_gap']:.3f} iters={res['iter']}")

    # (a) AL-iterate dual, dense f64 exact eig
    y_head = np.asarray(lam, dtype=np.float64)  # best_lam = -y[:m]
    # S = C + sum y_i A_i with y_i = -lam... rebuild directly:
    # constraints: [D-diag eq, ddT eq, X_ii<=ub ×n, -X_ii<=-lb ×n]
    y = -y_head
    y1a, y2a = y[0], y[1]
    za = y[2:2 + n] - y[2 + n:2 + 2 * n]
    Sa = L.toarray() + y1a * np.diag(d) + y2a * np.outer(d, d) + np.diag(za)
    lmin_a = float(np.linalg.eigvalsh(Sa)[0])
    lin_a = float(-(y1a * 1.0 + np.sum(y[2:2 + n]) * ub
                    - np.sum(y[2 + n:2 + 2 * n]) * (ub * 0 + 1) *
                    (args.mu / ((1 - args.mu) * volG))))
    dual_a = lin_a + tb * min(lmin_a, 0.0)
    print(f"(a) AL-iterate dual:   dual={dual_a:.6f} lam_min={lmin_a:.4f} "
          f"lin={lin_a:.6f} tb={tb:.4f}")

    # (b/c) generalized LS multiplier, exact eig
    dual_b, lmin_b, y1, y2, w = dual_value_mucond(
        L, d, volG, args.mu, np.asarray(R, np.float64), tb)
    print(f"(b) LS-multiplier dual: dual={dual_b:.6f} lam_min={lmin_b:.4f} "
          f"y1={y1:.4f} y2={y2:.4f}")
    obj = res["obj"]
    for tag, dv in (("AL", dual_a), ("LS", dual_b)):
        gap = (obj - dv) / max(min(abs(obj), abs(dv)), 1e-12)
        print(f"    gap vs {tag} dual: {gap:.4f}")


if __name__ == "__main__":
    main()
