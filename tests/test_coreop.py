"""Core-operator unit tests against dense oracles + finite differences.

Mirrors the reference's operator test suite (reference:
test/coreop.jl:34-214): forward 𝒜(RRᵀ) vs dense, analytic gradient vs
finite differences, adjoint S·x / x·S vs dense S, capped violations for
the inequality path, and the algebraic line-search commit invariant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import (
    cutnorm,
    lovasz_theta,
    make_random_graph,
    maxcut,
    minimum_bisection,
    mu_conductance,
    mu_conductance_ineq,
)
from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri, gradient
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.ops.forward import A_uu, A_uv
from sdplrplus_tpu.solver.al import al_value, capped_vio
from sdplrplus_tpu.solver.linesearch import exact_linesearch

from oracles import dense_S, dense_al, dense_primal_vio, fd_gradient

GENERATORS = [
    ("maxcut", maxcut),
    ("lovasz_theta", lovasz_theta),
    ("minimum_bisection", minimum_bisection),
    ("cutnorm", cutnorm),
    ("mu_conductance_0.05", lambda A: mu_conductance(A, 0.05)),
    ("mu_conductance_0.1", lambda A: mu_conductance(A, 0.1)),
]

CASES = [(5, 0.4, 2), (8, 0.7, 3), (12, 0.5, 2)]


def _build(gen, n, p, seed):
    A = make_random_graph(n, p, seed=seed)
    out = gen(A)
    if len(out) == 4:
        C, As, b, ct = out
        return SDPProblem(C, As, b, ct)
    C, As, b = out
    return SDPProblem(C, As, b, None)


def _padded(R, n_pad):
    Rp = np.zeros((n_pad, R.shape[1]))
    Rp[: R.shape[0]] = R
    return jnp.asarray(Rp)


@pytest.mark.parametrize("name,gen", GENERATORS)
@pytest.mark.parametrize("n,p,r", CASES)
def test_forward_and_al(name, gen, n, p, r):
    prob = _build(gen, n, p, seed=n + r)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float64)
    rng = np.random.default_rng(7)
    R = rng.uniform(-1, 1, size=(prob.n, r))
    Rp = _padded(R, cp.n_pad)

    av = np.asarray(A_uu(dp, Rp))
    pv_ref = dense_primal_vio(prob, R)
    # A_uu returns raw <A_i, RRT>; subtract b to compare violations
    av_v = av.copy()
    av_v[: prob.m] -= prob.b
    assert np.max(np.abs(av_v - pv_ref)) < 1e-10

    lam = rng.normal(size=prob.m)
    lam_ub = np.where(prob.constraint_types, 0.0, np.inf)
    lam = np.minimum(lam, lam_ub)
    sigma = 2.0
    L, vio_raw = al_value(dp, Rp, jnp.asarray(lam), sigma)
    assert abs(float(L) - dense_al(prob, R, lam, sigma)) < 1e-9
    assert np.max(np.abs(np.asarray(vio_raw) - pv_ref)) < 1e-10

    # capped violations (reference: test/coreop.jl:79-119)
    cv = np.asarray(capped_vio(dp, vio_raw))
    cv_ref = np.where(
        prob.constraint_types, np.maximum(pv_ref[: prob.m], 0.0), pv_ref[: prob.m]
    )
    assert np.max(np.abs(cv - cv_ref)) < 1e-10


@pytest.mark.parametrize("name,gen", GENERATORS)
@pytest.mark.parametrize("n,p,r", [(5, 0.4, 2), (8, 0.7, 3)])
def test_gradient_fd(name, gen, n, p, r):
    prob = _build(gen, n, p, seed=n * r)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float64)
    rng = np.random.default_rng(11)
    R = rng.uniform(-1, 1, size=(prob.n, r))
    Rp = _padded(R, cp.n_pad)
    lam = np.minimum(
        rng.normal(size=prob.m), np.where(prob.constraint_types, 0.0, np.inf)
    )
    sigma = 2.0

    _, vio_raw = al_value(dp, Rp, jnp.asarray(lam), sigma)
    G, _, _ = gradient(dp, Rp, jnp.asarray(lam), sigma, vio_raw)
    G = np.asarray(G)[: prob.n]

    G_fd = fd_gradient(prob, R, lam, sigma)
    rel = np.max(np.abs(G - G_fd)) / (1.0 + np.max(np.abs(G)))
    assert rel < 1e-7  # reference uses 1e-8 with FD; central diff noise floor


@pytest.mark.parametrize("name,gen", GENERATORS)
@pytest.mark.parametrize("n,p,r", CASES)
def test_adjoint_vs_dense(name, gen, n, p, r):
    prob = _build(gen, n, p, seed=n + 3 * r)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float64)
    rng = np.random.default_rng(13)
    y_full = rng.normal(size=prob.m + 1)
    s_tri = assemble_s_tri(dp, jnp.asarray(y_full))
    S_ref = dense_S(prob, y_full)

    X = rng.normal(size=(prob.n, r))
    Xp = _padded(X, cp.n_pad)
    SX = np.asarray(apply_S(dp, s_tri, jnp.asarray(y_full), Xp))
    assert np.max(np.abs(SX[: prob.n] - S_ref @ X)) < 1e-10
    assert np.max(np.abs(SX[prob.n:])) == 0.0  # pad rows exactly zero

    # symmetric S: the left-multiply overload x·S is (S·xᵀ)ᵀ — verify symmetry
    assert np.max(np.abs(S_ref - S_ref.T)) < 1e-12


@pytest.mark.parametrize("name,gen", GENERATORS[:4])
@pytest.mark.parametrize("n,p,r", [(8, 0.5, 2)])
def test_linesearch_commit_invariant(name, gen, n, p, r):
    """After the exact step, the algebraically-updated vio_raw must equal a
    fresh dense evaluation (reference: test/coreop.jl:66-72)."""
    prob = _build(gen, n, p, seed=n)
    if prob.has_inequalities:
        pytest.skip("exact line search is equality-only")
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float64)
    rng = np.random.default_rng(17)
    R = rng.uniform(-1, 1, size=(prob.n, r))
    Rp = _padded(R, cp.n_pad)
    lam = jnp.zeros(prob.m)
    sigma = 2.0

    _, vio_raw = al_value(dp, Rp, lam, sigma)
    G, _, _ = gradient(dp, Rp, lam, sigma, vio_raw)
    D = -G

    alpha, f_star, new_vio = exact_linesearch(dp, Rp, D, vio_raw, lam, sigma)
    R_new = np.asarray(Rp + alpha * D)[: prob.n]
    pv_ref = dense_primal_vio(prob, R_new)
    assert np.max(np.abs(np.asarray(new_vio) - pv_ref)) < 1e-9
    # the step must not increase the AL
    L0 = dense_al(prob, R, np.zeros(prob.m), sigma)
    assert float(f_star) <= L0 + 1e-10
