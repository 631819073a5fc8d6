"""Explicit shard_map inner loop vs single-device equivalence on the
8-device CPU mesh (the hand-placed-collectives path, SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import lovasz_theta, make_random_graph, maxcut, minimum_bisection
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
    cp = compile_problem(prob, ell_width=64)
    assert cp.ell2_rows.shape[0] == 0  # width 64 covers every row here
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


@requires_8
@pytest.mark.parametrize("dense", [False, True])
def test_shardmap_major_matches_single_device(dense):
    """The FUSED outer driver under shard_map (inner loop + Lanczos dual
    bound + dual ascent + penalty schedule) must match the single-device
    fused driver across several major-iteration boundaries."""
    from sdplrplus_tpu.parallel.shardmap import make_shardmap_major
    from sdplrplus_tpu.solver.major import init_major_carry, major_chunk

    A = make_random_graph(48, 0.5, seed=3)
    C, As, b = maxcut(A)
    prob = SDPProblem(C, As, b, None)
    cp = compile_problem(prob, ell_width=64, dense=dense)
    assert cp.ell2_rows.shape[0] == 0
    r, k = 3, 4
    rng = np.random.default_rng(1)
    R0 = np.zeros((cp.n_pad, r))
    R0[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
    lam0 = jnp.zeros(prob.m, jnp.float64)
    key = jax.random.PRNGKey(0)
    budget, q_max = 120, 64
    scalars = dict(
        budget=jnp.int32(budget), major_budget=jnp.int32(50),
        base_iter=jnp.int32(0), stag_tol=jnp.float64(-np.inf),
        ptol_final=jnp.float64(1e-3), gtol_final=jnp.float64(0.0),
        objtol=jnp.float64(1e-3), sigmafac=jnp.float64(2.0),
        trace_bound=jnp.float64(48.0), rankupd_tol=jnp.int32(4),
    )

    dp1 = to_device(cp, jnp.float64)
    carry0 = init_major_carry(
        dp1, jnp.asarray(R0), lam0, 2.0, 2.0 ** -0.1, 0.5, key,
        lbfgs_init(k, cp.n_pad, r, jnp.float64), 4,
        gtol_relative=True, ptol_relative=True,
    )
    out1, vn1 = major_chunk(
        dp1, carry0, *scalars.values(),
        k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
        objtol_relative=True, q_max=q_max, highprecision=False,
    )

    mesh = make_mesh(8)
    dp8, specs = shardmap_problem(cp, jnp.float64, mesh)
    run = make_shardmap_major(mesh, specs, k=k, use_armijo=False, q_max=q_max)
    out8, vn8 = run(dp8, carry0, *scalars.values())

    assert int(out8.ic.steps) == int(out1.ic.steps)
    assert int(out8.majoriters) == int(out1.majoriters)
    assert int(out8.feas_count) == int(out1.feas_count)
    np.testing.assert_allclose(
        np.asarray(out8.ic.R), np.asarray(out1.ic.R), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out8.lam), np.asarray(out1.lam), atol=1e-8
    )
    assert abs(float(out8.max_dual) - float(out1.max_dual)) < 1e-6 * max(
        1.0, abs(float(out1.max_dual))
    )
    assert abs(float(vn8) - float(vn1)) < 1e-9


def test_shardmap_major_entry_mode_matches_single_device():
    """Entry-mode (Lovász-θ) fused driver under an 8-device shard_map:
    the dense (n, n) violation/dual masks row-shard, the per-entry
    scatter/gathers localize through the shard row offset, and the
    trajectory must match the single-device entry-mode run exactly
    (round-2 gap: the shard_map path silently dropped entry mode)."""
    from sdplrplus_tpu.parallel.shardmap import make_shardmap_major
    from sdplrplus_tpu.solver.major import init_major_carry, major_chunk

    A = make_random_graph(40, 0.3, seed=11)
    C, As, b = lovasz_theta(A)
    prob = SDPProblem(C, As, np.asarray(b, float), None)
    cp = compile_problem(prob, entry=True, n_shards=8)
    assert cp.ew_c2 is not None  # entry mode compiled in
    r, k = 3, 4
    rng = np.random.default_rng(2)
    R0 = np.zeros((cp.n_pad, r))
    R0[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
    lam0 = jnp.zeros(prob.m, jnp.float64)
    key = jax.random.PRNGKey(0)
    q_max = 64
    scalars = dict(
        budget=jnp.int32(100), major_budget=jnp.int32(40),
        base_iter=jnp.int32(0), stag_tol=jnp.float64(-np.inf),
        ptol_final=jnp.float64(1e-3), gtol_final=jnp.float64(0.0),
        objtol=jnp.float64(1e-2), sigmafac=jnp.float64(2.0),
        trace_bound=jnp.float64(1.0), rankupd_tol=jnp.int32(4),
    )

    dp1 = to_device(cp, jnp.float64)
    assert dp1.ew_c2 is not None
    carry0 = init_major_carry(
        dp1, jnp.asarray(R0), lam0, 2.0, 2.0 ** -0.1, 0.5, key,
        lbfgs_init(k, cp.n_pad, r, jnp.float64), 4,
        gtol_relative=True, ptol_relative=True,
    )
    out1, vn1 = major_chunk(
        dp1, carry0, *scalars.values(),
        k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
        objtol_relative=True, q_max=q_max, highprecision=False,
    )
    assert int(out1.ic.steps) > 0

    mesh = make_mesh(8)
    dp8, specs = shardmap_problem(cp, jnp.float64, mesh)
    assert dp8.ew_c2 is not None  # no silent downgrade
    run = make_shardmap_major(mesh, specs, k=k, use_armijo=False, q_max=q_max)
    out8, vn8 = run(dp8, carry0, *scalars.values())

    assert int(out8.ic.steps) == int(out1.ic.steps)
    assert int(out8.majoriters) == int(out1.majoriters)
    np.testing.assert_allclose(
        np.asarray(out8.ic.R), np.asarray(out1.ic.R), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out8.ic.vio_raw), np.asarray(out1.ic.vio_raw), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out8.lam), np.asarray(out1.lam), atol=1e-8
    )
    assert abs(float(vn8) - float(vn1)) < 1e-9
