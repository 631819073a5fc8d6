"""Entrywise dense-mask mode (ops/entrymask.py, solver/inner_entry.py).

Strategy mirrors the reference's dense-oracle pattern (reference:
test/coreop.jl): every entry-mode kernel must reproduce the general
gather-path kernel exactly (f64, 1e-9), chunk trajectories must match
step for step, and end-to-end solves must agree across modes and
drivers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem, sdplr
from sdplrplus_tpu.models import lovasz_theta, make_random_graph, maxcut, minimum_bisection
from sdplrplus_tpu.ops.adjoint import gradient
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.ops.entrymask import (
    apply_C_entry,
    entry_lam,
    entry_merge,
    entry_split,
    gradient_entry,
    linesearch_entry,
    vio_norm_entry,
)
from sdplrplus_tpu.solver.al import al_value_grad
from sdplrplus_tpu.solver.inner import inner_chunk
from sdplrplus_tpu.solver.inner_entry import entry_chunk
from sdplrplus_tpu.solver.lbfgs import lbfgs_init
from sdplrplus_tpu.solver.linesearch import exact_linesearch


def _problem(gen=lovasz_theta, n=12, p=0.5, seed=3):
    A = make_random_graph(n, p, seed=seed)
    C, As, b = gen(A)
    return SDPProblem(C, As, b, None)


def _pair(prob):
    """(dp_entry, dp_general) compiled from the same problem."""
    cpe = compile_problem(prob, entry=True, dense=False)
    cpg = compile_problem(prob, entry=False, dense=False)
    return to_device(cpe, jnp.float64), to_device(cpg, jnp.float64)


def test_entry_auto_selected_for_lovasz_theta():
    cp = compile_problem(_problem())
    assert cp.ew_c2 is not None
    assert cp.C_dense is None


def test_entry_auto_not_selected_for_dense_mode_maxcut():
    A = make_random_graph(10, 0.5, seed=0)
    C, As, b = maxcut(A)
    cp = compile_problem(SDPProblem(C, As, b, None))
    assert cp.ew_c2 is None  # dense MXU mode covers diagonal families


def test_split_merge_roundtrip():
    prob = _problem()
    dpe, _ = _pair(prob)
    rng = np.random.default_rng(0)
    vio = jnp.asarray(rng.normal(size=prob.m + 1))
    v_ew, v_ex, obj = entry_split(dpe, vio)
    back = entry_merge(dpe, v_ew, v_ex, obj)
    np.testing.assert_allclose(np.asarray(back), np.asarray(vio), atol=1e-14)


@pytest.mark.parametrize("gen", [lovasz_theta, minimum_bisection])
def test_gradient_entry_matches_general(gen):
    prob = _problem(gen)
    dpe, dpg = _pair(prob)
    rng = np.random.default_rng(1)
    r = 3
    R = jnp.asarray(rng.normal(size=(dpg.n_pad, r)))
    R = R.at[prob.n :].set(0.0)
    lam = jnp.asarray(rng.normal(size=prob.m))
    sigma = jnp.asarray(2.7)

    _, vio_raw, G_ref, _, _, _ = al_value_grad(
        dpg, R, lam, sigma, gtol_relative=False, ptol_relative=False
    )
    v_ew, v_ex, obj = entry_split(dpe, vio_raw)
    Lam_ew, lam_ex = entry_lam(dpe, lam)
    CR = apply_C_entry(dpe, R)
    G = gradient_entry(dpe, R, CR, v_ew, v_ex, Lam_ew, lam_ex, sigma)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ref), atol=1e-9)

    # vio norm agrees with the m-vector norm
    vn = vio_norm_entry(dpe, v_ew, v_ex, 1.0)
    np.testing.assert_allclose(
        float(vn), float(jnp.linalg.norm(vio_raw[: prob.m])), atol=1e-10
    )


@pytest.mark.parametrize("gen", [lovasz_theta, minimum_bisection])
def test_linesearch_entry_matches_general(gen):
    prob = _problem(gen)
    dpe, dpg = _pair(prob)
    rng = np.random.default_rng(2)
    r = 3
    R = jnp.asarray(rng.normal(size=(dpg.n_pad, r)))
    R = R.at[prob.n :].set(0.0)
    D = jnp.asarray(rng.normal(size=(dpg.n_pad, r)))
    D = D.at[prob.n :].set(0.0)
    lam = jnp.asarray(rng.normal(size=prob.m))
    sigma = jnp.asarray(3.1)

    _, vio_raw, G_ref, _, _, _ = al_value_grad(
        dpg, R, lam, sigma, gtol_relative=False, ptol_relative=False
    )
    # use a descent direction so the quartic has a proper minimizer
    D = -G_ref
    alpha_ref, L_ref, vio_ref = exact_linesearch(dpg, R, D, vio_raw, lam, sigma)

    v_ew, v_ex, obj = entry_split(dpe, vio_raw)
    Lam_ew, lam_ex = entry_lam(dpe, lam)
    ls = linesearch_entry(dpe, R, D, v_ew, v_ex, obj, Lam_ew, lam_ex, sigma)
    assert abs(float(ls.alpha) - float(alpha_ref)) < 1e-9
    np.testing.assert_allclose(float(ls.L_new), float(L_ref), rtol=1e-9)
    merged = entry_merge(dpe, ls.v_ew, ls.v_ex, ls.obj)
    np.testing.assert_allclose(
        np.asarray(merged), np.asarray(vio_ref), atol=1e-9
    )


def test_entry_chunk_trajectory_matches_inner_chunk():
    prob = _problem(n=14, p=0.45, seed=5)
    dpe, dpg = _pair(prob)
    rng = np.random.default_rng(4)
    r, k = 3, 4
    R = jnp.asarray(rng.normal(size=(dpg.n_pad, r)))
    R = R.at[prob.n :].set(0.0)
    lam = jnp.zeros((prob.m,))
    sigma = 2.0

    L, vio, G, y_full, gnorm, _ = al_value_grad(
        dpg, R, lam, sigma, gtol_relative=True, ptol_relative=True
    )
    lb = lbfgs_init(k, dpg.n_pad, r, jnp.float64)
    common = dict(lam=lam, sigma=sigma, cur_gtol=1e-30, stag_tol=0.0,
                  max_steps=25)
    ref, vn_ref = inner_chunk(
        dpg, R, G, y_full, vio, L, gnorm, lb, **common,
        k=k, use_armijo=False, gtol_relative=True, ptol_relative=True,
    )
    got, vn = entry_chunk(
        dpe, R, G, vio, L, gnorm, lb, **common,
        k=k, gtol_relative=True, ptol_relative=True,
    )
    assert int(got.steps) == int(ref.steps)
    np.testing.assert_allclose(np.asarray(got.R), np.asarray(ref.R), atol=1e-7)
    np.testing.assert_allclose(float(got.L_val), float(ref.L_val), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got.vio_raw), np.asarray(ref.vio_raw), atol=1e-7
    )
    np.testing.assert_allclose(float(vn), float(vn_ref), rtol=1e-7)


@pytest.mark.parametrize("fused", [False, True])
def test_e2e_lovasz_theta_entry_matches_general(fused):
    A = make_random_graph(10, 0.5, seed=7)
    C, As, b = lovasz_theta(A)
    kw = dict(ptol=1e-4, objtol=np.inf, prior_trace_bound=1.0,
              printlevel=0, seed=0, maxtime=120.0, fused_outer=fused)
    res_e = sdplr(C, As, b, 3, entry_mode=True, **kw)
    res_g = sdplr(C, As, b, 3, entry_mode=False, **kw)
    assert abs(res_e["obj"] - res_g["obj"]) < 1e-3 * max(1, abs(res_g["obj"]))
    assert res_e["primal_vio"] <= 1e-4 + 1e-10


def test_assemble_S_dense_matches_apply_S():
    from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri
    from sdplrplus_tpu.ops.entrymask import assemble_S_dense

    for gen in (lovasz_theta, minimum_bisection):
        prob = _problem(gen, n=11, p=0.5, seed=9)
        dpe, dpg = _pair(prob)
        rng = np.random.default_rng(11)
        y_full = jnp.asarray(rng.normal(size=prob.m + 1))
        x = jnp.asarray(rng.normal(size=(dpg.n_pad, 2)))
        x = x.at[prob.n :].set(0.0)
        s_tri = assemble_s_tri(dpg, y_full)
        ref = apply_S(dpg, s_tri, y_full, x)
        S = assemble_S_dense(dpe, y_full)
        np.testing.assert_allclose(np.asarray(S @ x), np.asarray(ref), atol=1e-9)
        np.testing.assert_allclose(np.asarray(S), np.asarray(S).T, atol=1e-12)


def test_e2e_maxcut_k2_entry_forced():
    # K2 MaxCut: obj = -1 (reference: test/maxcut.jl:24); entry mode can
    # be forced even for diagonal families
    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    import scipy.sparse as sp

    C, As, b = maxcut(sp.csr_matrix(A))
    res = sdplr(C, As, b, 2, entry_mode=True, dense_mode=False,
                ptol=1e-8, objtol=np.inf, printlevel=0, prior_trace_bound=2.0)
    assert abs(res["obj"] - (-1.0)) < 1e-6
