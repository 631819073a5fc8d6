"""Megakernel (ops/megakernel.py) vs the XLA inner loop (solver/inner.py).

The Pallas megakernel must be functionally identical to the lax.while_loop
inner chunk; these tests run it in interpreter mode on the CPU mesh and
compare trajectories step by step, plus end-to-end solves through the
outer driver with ``inner_impl='mega'``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu.compile import compile_problem
from sdplrplus_tpu.config import SolverConfig
from sdplrplus_tpu.models.problems import (
    make_random_graph, maxcut, minimum_bisection, cutnorm,
)
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.ops.megakernel import (
    make_mega_inner_chunk, megakernel_eligible,
)
from sdplrplus_tpu.problem import SDPProblem
from sdplrplus_tpu.solver.inner import inner_chunk
from sdplrplus_tpu.solver.lbfgs import lbfgs_init
from sdplrplus_tpu.solver import outer


def _setup(problem="maxcut", n=24, p=0.5, r=3, seed=0, dtype=jnp.float32):
    A = make_random_graph(n, p, seed=seed)
    if problem == "maxcut":
        C, As, b = maxcut(A)
    elif problem == "minbis":
        C, As, b = minimum_bisection(A)
    elif problem == "cutnorm":
        C, As, b = cutnorm(A)
    prob = SDPProblem(C, As, np.asarray(b, np.float64), None)
    cp = compile_problem(prob, dense=True)
    dp = to_device(cp, dtype)
    rng = np.random.default_rng(seed + 1)
    R0 = np.zeros((dp.n_pad, r))
    R0[: dp.n] = rng.uniform(-1, 1, (dp.n, r))
    lam = rng.standard_normal(dp.m) * 0.1
    return dp, jnp.asarray(R0, dtype), jnp.asarray(lam, dtype)


@pytest.mark.parametrize("problem", ["maxcut", "minbis", "cutnorm"])
@pytest.mark.parametrize("k", [4, 0])
def test_megakernel_matches_xla_inner(problem, k):
    dtype = jnp.float32
    dp, R, lam = _setup(problem)
    r = R.shape[1]
    assert megakernel_eligible(dp, r, k, False, dtype)

    sigma = jnp.asarray(2.0, dtype)
    stag_tol = 0.0          # disable stagnation: compare fixed step counts
    gtol = 1e-12            # don't converge inside the window
    lbfgs = lbfgs_init(max(k, 1), dp.n_pad, r, dtype)

    run = make_mega_inner_chunk(
        dp, k=k, gtol_relative=True, ptol_relative=True, interpret=True
    )(r)

    from sdplrplus_tpu.solver.al import al_value_grad

    L0, vio0, G0, y0, gn0, _ = al_value_grad(
        dp, R, lam, sigma, gtol_relative=True, ptol_relative=True
    )

    for steps in (1, 25):
        c_x, vn_x = inner_chunk(
            dp, R, G0, y0, vio0, L0, gn0, lbfgs, lam, sigma,
            jnp.asarray(gtol, dtype), jnp.asarray(stag_tol, dtype), steps,
            k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
            lbfgs_compact=False,
        )
        c_m, vn_m = run(R, lbfgs, lam, sigma,
                        jnp.asarray(gtol, dtype), jnp.asarray(stag_tol, dtype),
                        jnp.asarray(steps, jnp.int32))
        assert int(c_m.steps) == int(c_x.steps) == steps
        tol = 1e-4 if steps == 1 else 3e-3
        scale = float(jnp.abs(c_x.L_val)) + 1.0
        assert abs(float(c_m.L_val) - float(c_x.L_val)) / scale < tol
        np.testing.assert_allclose(
            np.asarray(c_m.R), np.asarray(c_x.R), rtol=tol, atol=tol * 10
        )
        np.testing.assert_allclose(
            np.asarray(c_m.vio_raw), np.asarray(c_x.vio_raw),
            rtol=tol, atol=tol * 10
        )
        assert abs(float(vn_m) - float(vn_x)) < tol * 10
        assert abs(float(c_m.grad_norm) - float(c_x.grad_norm)) \
            / (float(c_x.grad_norm) + 1e-9) < 0.05


def test_megakernel_gtol_exit_and_history():
    """The kernel stops at gtol like the XLA loop, and its L-BFGS ring
    round-trips through LBFGSState across chunk calls."""
    dtype = jnp.float32
    dp, R, lam = _setup("maxcut")
    r = R.shape[1]
    k = 4
    lbfgs = lbfgs_init(k, dp.n_pad, r, dtype)
    run = make_mega_inner_chunk(
        dp, k=k, gtol_relative=True, ptol_relative=True, interpret=True
    )(r)
    sigma = jnp.asarray(2.0, dtype)

    # two chunks of 5 == one chunk of 10 (ring state must round-trip)
    c1, _ = run(R, lbfgs, lam, sigma, 1e-12, 0.0, 5)
    c2, _ = run(c1.R, c1.lbfgs, lam, sigma, 1e-12, 0.0, 5)
    c10, _ = run(R, lbfgs, lam, sigma, 1e-12, 0.0, 10)
    assert int(c2.steps) == 5 and int(c10.steps) == 10
    np.testing.assert_allclose(
        np.asarray(c2.R), np.asarray(c10.R), rtol=0, atol=2e-3
    )
    rel = abs(float(c2.L_val) - float(c10.L_val)) / (abs(float(c10.L_val)) + 1)
    assert rel < 1e-3

    # loose gtol: must exit early with grad_norm <= gtol
    c_e, _ = run(R, lbfgs, lam, sigma, 1e-1, 0.0, 10000)
    assert int(c_e.steps) < 10000
    assert float(c_e.grad_norm) <= 1e-1


@pytest.mark.parametrize("problem,expect",
                         [("maxcut", None), ("minbis", None)])
def test_e2e_solve_with_megakernel(problem, expect):
    """End-to-end _solve_host with inner_impl='mega' matches the XLA path
    objective on a small graph at the benchmark tolerances."""
    A = make_random_graph(20, 0.5, seed=3)
    if problem == "maxcut":
        C, As, b = maxcut(A)
    else:
        C, As, b = minimum_bisection(A)

    common = dict(
        ptol=1e-2, objtol=1e-2, printlevel=0, seed=0, dtype="float32",
        prior_trace_bound=float(A.shape[0]), fused_outer=False,
        dense_mode=True, maxmajoriter=60,
    )
    from sdplrplus_tpu.solver.outer import sdplr

    res_x = sdplr(C, As, b, 4, inner_impl="xla", **common)
    res_m = sdplr(C, As, b, 4, inner_impl="mega", **common)
    assert res_m["primal_vio"] <= 1.5e-2
    rel = abs(res_m["obj"] - res_x["obj"]) / max(abs(res_x["obj"]), 1e-9)
    assert rel < 2e-2


def test_megakernel_ineligible_cases():
    from sdplrplus_tpu.models.problems import lovasz_theta
    A = make_random_graph(16, 0.4, seed=1)
    # lovasz_theta has off-diagonal constraints -> not dense eligible
    C, As, b = lovasz_theta(A)
    prob = SDPProblem(C, As, np.asarray(b, np.float64), None)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float32)
    assert not megakernel_eligible(dp, 3, 4, False, jnp.float32)
    # Armijo (inequality) requests now route to the Armijo variant for
    # diagonal-constraint families instead of being rejected
    dp2 = _setup("maxcut")[0]
    assert megakernel_eligible(dp2, 3, 4, True, jnp.float32)


def _mucond_setup(n=60, seed=2, mu=0.1):
    import scipy.sparse as sp

    from sdplrplus_tpu.models.problems import mu_conductance_ineq

    rng_A = sp.random(n, n, density=0.12, random_state=seed)
    A = ((rng_A + rng_A.T) > 0).astype(float)
    A.setdiag(0)
    A.eliminate_zeros()
    C, As, b, ct = mu_conductance_ineq(A, mu)
    prob = SDPProblem(C, list(As), np.asarray(b, np.float64), ct)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float32)
    return prob, cp, dp


def test_armijo_megakernel_initial_state_matches_oracle():
    """The Armijo kernel recomputes (L, G, vio) from R on entry; they
    must equal the XLA sharp-AL oracle (solver/al.al_value_grad)."""
    from sdplrplus_tpu.ops.megakernel import (
        mega_chunk_traced, mega_spec_for, prepare_mega_data,
    )
    from sdplrplus_tpu.solver.al import al_value_grad
    from sdplrplus_tpu.solver.lbfgs import lbfgs_init

    prob, cp, dp = _mucond_setup()
    r, k = 6, 4
    assert megakernel_eligible(dp, r, k, True, jnp.float32)
    meta, data = prepare_mega_data(
        dp, k=k, gtol_relative=True, ptol_relative=True
    )
    spec = mega_spec_for(meta, r)
    assert spec.armijo and spec.J >= 2 and spec.n_wide == 1

    rng = np.random.default_rng(0)
    R = jnp.asarray(
        np.vstack([rng.uniform(-1, 1, (cp.n, r)),
                   np.zeros((cp.n_pad - cp.n, r))]), jnp.float32)
    lam = jnp.asarray(rng.normal(size=cp.m) * 0.01, jnp.float32)
    lam = jnp.minimum(dp.lam_ub, lam)
    sigma = jnp.asarray(2.0, jnp.float32)
    L, vio_raw, G, y_full, gn, _ = al_value_grad(
        dp, R, lam, sigma, gtol_relative=True, ptol_relative=True
    )
    lbfgs = lbfgs_init(k, cp.n_pad, r, jnp.float32)
    carry, _ = mega_chunk_traced(
        spec, r, cp.m, True, meta["pscale"], data, R, lbfgs, lam, sigma,
        jnp.asarray(0.0, jnp.float32), jnp.asarray(-np.inf, jnp.float32),
        jnp.asarray(0, jnp.int32),
    )
    sc = max(abs(float(L)), 1.0)
    assert abs(float(carry.L_val) - float(L)) <= 1e-4 * sc
    np.testing.assert_allclose(
        np.asarray(carry.vio_raw), np.asarray(vio_raw),
        rtol=2e-4, atol=1e-4,
    )
    assert abs(float(carry.grad_norm) - float(gn)) <= 1e-3 * float(gn)


def test_armijo_megakernel_e2e_mucond():
    """Full μ-conductance solve through the Armijo megakernel vs the XLA
    engine: same certified objective at protocol tolerances. (Trajectory
    equality is not expected — at stiff early iterates the direction is
    chaotic in f32 dot order — but both engines must converge to the
    same optimum with valid certificates.)"""
    from sdplrplus_tpu.solver.outer import sdplr

    import scipy.sparse as sp

    from sdplrplus_tpu.models.problems import mu_conductance_ineq

    rng_A = sp.random(60, 60, density=0.12, random_state=2)
    A = ((rng_A + rng_A.T) > 0).astype(float)
    A.setdiag(0)
    A.eliminate_zeros()
    C, As, b, ct = mu_conductance_ineq(A, 0.1)
    common = dict(
        constraint_types=ct, ptol=1e-2, objtol=1e-2, printlevel=0,
        seed=0, dtype="float32", prior_trace_bound=60.0, maxtime=240.0,
    )
    res_x = sdplr(C, As, b, 6, inner_impl="xla", **common)
    res_m = sdplr(C, As, b, 6, inner_impl="mega", **common)
    assert res_m["inner_engine"] == "pallas-megakernel"
    assert res_m["primal_vio"] <= 1.5e-2
    assert res_m["rel_duality_gap"] <= 1.5e-2
    rel = abs(res_m["obj"] - res_x["obj"]) / max(abs(res_x["obj"]), 1e-9)
    assert rel < 2e-2
