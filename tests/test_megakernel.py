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
    # inequality problems use Armijo -> ineligible
    dp2, _, _ = _setup("maxcut")[0], None, None
    assert not megakernel_eligible(dp2, 3, 4, True, jnp.float32)
