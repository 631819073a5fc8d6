"""Explicit shard_map inner loop vs single-device equivalence on the
8-device CPU mesh (the hand-placed-collectives path, SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import make_random_graph, maxcut, minimum_bisection
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.parallel.shardmap import AXIS, make_shardmap_inner, shardmap_problem
from sdplrplus_tpu.parallel.spmd import make_mesh
from sdplrplus_tpu.solver.al import al_value_grad
from sdplrplus_tpu.solver.inner import inner_chunk
from sdplrplus_tpu.solver.lbfgs import lbfgs_init

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@requires_8
@pytest.mark.parametrize("gen", [maxcut, minimum_bisection])
def test_shardmap_inner_matches_single_device(gen):
    A = make_random_graph(48, 0.5, seed=7)
    C, As, b = gen(A)
    prob = SDPProblem(C, As, b, None)
    # wide ELL so there is no COO tail (shard_map v1 requirement)
    cp = compile_problem(prob, ell_width=64)
    assert cp.tail_rows.shape[0] == 0
    r, k = 3, 4
    rng = np.random.default_rng(0)
    R0 = np.zeros((cp.n_pad, r))
    R0[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
    lam0 = np.zeros(prob.m)
    sigma = 2.0
    steps = 12

    # ---- single device reference
    dp1 = to_device(cp, jnp.float64)
    fg = jax.jit(al_value_grad, static_argnames=("gtol_relative", "ptol_relative"))
    L, vio, G, y, gn, _ = fg(dp1, jnp.asarray(R0), jnp.asarray(lam0), sigma,
                             gtol_relative=True, ptol_relative=True)
    lb = lbfgs_init(k, cp.n_pad, r, jnp.float64)
    carry1, vn1 = inner_chunk(
        dp1, jnp.asarray(R0), G, y, vio, L, gn, lb, jnp.asarray(lam0), sigma,
        jnp.float64(0.0), jnp.float64(-np.inf), steps,
        k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
    )

    # ---- shard_map over 8 devices
    mesh = make_mesh(8)
    dp8, specs = shardmap_problem(cp, jnp.float64, mesh)
    run = make_shardmap_inner(mesh, specs, k=k, use_armijo=False)
    carry8, vn8 = run(
        dp8, jnp.asarray(R0), G, y, vio, L, gn, lb, jnp.asarray(lam0),
        jnp.float64(sigma), jnp.float64(0.0), jnp.float64(-np.inf),
        jnp.int32(steps),
    )

    assert int(carry8.steps) == int(carry1.steps) == steps
    assert np.allclose(np.asarray(carry8.R), np.asarray(carry1.R), atol=1e-9)
    assert abs(float(carry8.L_val) - float(carry1.L_val)) < 1e-9 * max(
        1.0, abs(float(carry1.L_val))
    )
    assert abs(float(vn8) - float(vn1)) < 1e-10
    assert abs(float(carry8.grad_norm) - float(carry1.grad_norm)) < 1e-9
