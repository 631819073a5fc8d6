"""Sharded-vs-single-device equivalence (the multi-host analog of the
reference's dense-oracle pattern, SURVEY §4(e)): every hot operator and a
full inner-loop chunk must produce bitwise-identical semantics on an
8-device mesh and on one device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import make_random_graph, maxcut, minimum_bisection
from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.ops.forward import A_uu, A_uv
from sdplrplus_tpu.parallel.spmd import (
    make_mesh,
    replicate,
    shard_factor,
    shard_problem,
)
from sdplrplus_tpu.solver.al import al_value_grad
from sdplrplus_tpu.solver.inner import inner_chunk
from sdplrplus_tpu.solver.lbfgs import lbfgs_init

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(gen=maxcut, n=64, r=4, seed=0):
    A = make_random_graph(n, 0.6, seed=seed)
    C, As, b = gen(A)
    prob = SDPProblem(C, As, b, None)
    cp = compile_problem(prob)
    rng = np.random.default_rng(seed)
    R = np.zeros((cp.n_pad, r))
    R[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
    return prob, cp, R


@requires_8
@pytest.mark.parametrize("gen", [maxcut, minimum_bisection])
def test_sharded_ops_match_single_device(gen):
    prob, cp, R = _setup(gen)
    mesh = make_mesh(8)

    dp1 = to_device(cp, jnp.float64)
    dp8 = shard_problem(cp, jnp.float64, mesh)

    R1 = jnp.asarray(R)
    R8 = shard_factor(R1, mesh)

    a1 = np.asarray(A_uu(dp1, R1))
    a8 = np.asarray(jax.jit(A_uu)(dp8, R8))
    assert np.allclose(a1, a8, atol=1e-12)

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=prob.m + 1))
    s1 = assemble_s_tri(dp1, y)
    s8 = jax.jit(assemble_s_tri)(dp8, replicate(y, mesh))
    assert np.allclose(np.asarray(s1), np.asarray(s8), atol=1e-12)

    g1 = np.asarray(apply_S(dp1, s1, y, R1))
    g8 = np.asarray(jax.jit(apply_S)(dp8, s8, replicate(y, mesh), R8))
    assert np.allclose(g1, g8, atol=1e-12)


@requires_8
def test_sharded_inner_chunk_matches_single_device():
    prob, cp, R = _setup(maxcut, n=48, r=3, seed=2)
    mesh = make_mesh(8)
    k = 4

    def run(dp, R0, lam, sigma):
        fg = jax.jit(
            al_value_grad, static_argnames=("gtol_relative", "ptol_relative")
        )
        L, vio_raw, G, y_full, gn, pn = fg(
            dp, R0, lam, sigma, gtol_relative=True, ptol_relative=True
        )
        lb = lbfgs_init(k, cp.n_pad, R0.shape[1], jnp.float64)
        carry, vn = inner_chunk(
            dp, R0, G, y_full, vio_raw, L, gn, lb, lam, sigma,
            jnp.float64(0.0), jnp.float64(-np.inf), 10,
            k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
        )
        return np.asarray(carry.R), float(carry.L_val), float(vn)

    dp1 = to_device(cp, jnp.float64)
    R1, L1, v1 = run(dp1, jnp.asarray(R), jnp.zeros(prob.m), 2.0)

    dp8 = shard_problem(cp, jnp.float64, mesh)
    R8, L8, v8 = run(
        dp8,
        shard_factor(jnp.asarray(R), mesh),
        replicate(jnp.zeros(prob.m), mesh),
        2.0,
    )

    assert np.allclose(R1, R8, atol=1e-9)
    assert abs(L1 - L8) < 1e-9 * max(1.0, abs(L1))
    assert abs(v1 - v8) < 1e-10
