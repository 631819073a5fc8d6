"""Unit tests for the numeric building blocks: closed-form cubic roots,
quartic minimization, L-BFGS ring buffer semantics, Lanczos min-eig, and
the SymLowRank norm (reference: test/symlowrank.jl:2-15)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import make_random_graph, maxcut
from sdplrplus_tpu.ops.cubic import cubic_real_roots, minimize_quartic
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.ops.lanczos import (
    lanczos_alpha_beta,
    lanczos_alpha_beta_reorth,
    tridiag_min_eig,
)
from sdplrplus_tpu.problem import SymLowRank
from sdplrplus_tpu.ops.adjoint import assemble_s_tri
from sdplrplus_tpu.solver.lbfgs import (
    lbfgs_clear,
    lbfgs_direction,
    lbfgs_init,
    lbfgs_push,
)

from oracles import dense_S


# ---------------------------------------------------------------- cubic
@pytest.mark.parametrize("coeffs", [
    (1.0, -6.0, 11.0, -6.0),   # roots 1, 2, 3
    (2.0, 0.0, -8.0, 0.0),     # roots 0, ±2
    (1.0, 0.0, 0.0, -8.0),     # single real root 2
    (0.0, 1.0, -3.0, 2.0),     # quadratic: roots 1, 2
    (0.0, 0.0, 2.0, -3.0),     # linear: root 1.5
])
def test_cubic_real_roots(coeffs):
    a, b, c, d = coeffs
    roots = np.asarray(cubic_real_roots(a, b, c, d))
    roots = roots[~np.isnan(roots)]
    np_roots = np.roots([a, b, c, d]) if a != 0 else (
        np.roots([b, c, d]) if b != 0 else np.array([-d / c])
    )
    np_real = np.sort(np_roots[np.abs(np_roots.imag) < 1e-9].real)
    assert roots.shape[0] == np_real.shape[0]
    assert np.allclose(np.sort(roots), np_real, atol=1e-8)


def test_minimize_quartic_matches_grid():
    rng = np.random.default_rng(0)
    for _ in range(50):
        c = rng.normal(size=5)
        c[4] = abs(c[4]) + 0.1  # positive leading coeff -> bounded below
        amax = 1.0
        alpha, fval = minimize_quartic(tuple(jnp.float64(x) for x in c), jnp.float64(amax))
        grid = np.linspace(0, amax, 20001)
        fgrid = c[0] + grid * (c[1] + grid * (c[2] + grid * (c[3] + grid * c[4])))
        assert float(fval) <= fgrid.min() + 1e-8
        assert 0.0 <= float(alpha) <= amax


# ---------------------------------------------------------------- L-BFGS
def test_lbfgs_matches_dense_reference():
    """Two-loop recursion on the ring buffer must match a straightforward
    list-based two-loop implementation."""
    rng = np.random.default_rng(5)
    n, r, k = 16, 3, 4
    state = lbfgs_init(k, n, r, jnp.float64)

    pairs = []
    G = jnp.asarray(rng.normal(size=(n, r)))
    for step in range(6):  # overfill the ring to exercise wraparound
        d = lbfgs_direction(state, G, k)

        # dense reference two-loop (newest->oldest), matching reference
        # semantics (src/lbfgs.jl:77-117): no H0 scaling, negate at end
        q = np.asarray(G).copy()
        alphas = []
        for (s, y, rho) in reversed(pairs[-k:]):
            a = rho * np.vdot(s, q)
            q = q - a * y
            alphas.append(a)
        for (s, y, rho), a in zip(pairs[-k:], reversed(alphas)):
            b = rho * np.vdot(y, q)
            q = q + (a - b) * s
        assert np.allclose(np.asarray(d), -q, atol=1e-12)

        alpha = 0.1 + 0.05 * step
        G_new = jnp.asarray(rng.normal(size=(n, r)))
        state = lbfgs_push(state, alpha, d, G, G_new, k)
        s_np = alpha * np.asarray(d)
        y_np = np.asarray(G_new) - np.asarray(G)
        pairs.append((s_np, y_np, 1.0 / np.vdot(y_np, s_np)))
        G = G_new

    state = lbfgs_clear(state)
    d = lbfgs_direction(state, G, k)
    assert np.allclose(np.asarray(d), -np.asarray(G))


# ---------------------------------------------------------------- Lanczos
def _setup_S(n=24, seed=3):
    A = make_random_graph(n, 0.4, seed=seed)
    C, As, b = maxcut(A)
    prob = SDPProblem(C, As, b, None)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.float64)
    rng = np.random.default_rng(seed)
    y_full = jnp.asarray(rng.normal(size=prob.m + 1))
    s_tri = assemble_s_tri(dp, y_full)
    S_ref = dense_S(prob, np.asarray(y_full))
    return dp, s_tri, y_full, S_ref


def test_lanczos_mineig():
    dp, s_tri, y_full, S_ref = _setup_S()
    lam_min_ref = np.linalg.eigvalsh(S_ref)[0]
    key = jax.random.PRNGKey(0)
    q = dp.n - 1
    alpha, beta, k_eff = lanczos_alpha_beta(
        dp, s_tri, y_full, key, jnp.int32(q), q_max=64
    )
    est = tridiag_min_eig(np.asarray(alpha), np.asarray(beta), int(k_eff))
    assert abs(est - lam_min_ref) < 1e-6 * max(1.0, abs(lam_min_ref))


def test_lanczos_reorth_mineig():
    dp, s_tri, y_full, S_ref = _setup_S(seed=9)
    lam_min_ref = np.linalg.eigvalsh(S_ref)[0]
    key = jax.random.PRNGKey(1)
    alpha, beta, k_eff = lanczos_alpha_beta_reorth(
        dp, s_tri, y_full, key, q_max=32
    )
    est = tridiag_min_eig(np.asarray(alpha), np.asarray(beta), int(k_eff))
    assert abs(est - lam_min_ref) < 1e-8 * max(1.0, abs(lam_min_ref))


# ---------------------------------------------------------------- SymLowRank
def test_symlowrank_norm():
    """Frobenius norm via the Gram trick vs dense expansion
    (reference: test/symlowrank.jl:2-15)."""
    rng = np.random.default_rng(2)
    for _ in range(20):
        n, s = rng.integers(3, 20), rng.integers(1, 4)
        B = rng.normal(size=(n, s))
        d = rng.normal(size=s)
        M = SymLowRank(B, d)
        dense = (B * d) @ B.T
        assert abs(M.norm_fro() - np.linalg.norm(dense)) < 1e-9


# ---------------------------------------------------------------- adapter
def test_custom_model_adapter():
    """External-model adapter (reference: src/lowrankopt.jl analog): solve
    K2 maxcut through dense user-supplied operators."""
    import scipy.sparse as sp
    from sdplrplus_tpu.adapter import dense_model
    from sdplrplus_tpu.solver.outer import solve_model

    A = np.array([[0.0, 1.0], [1.0, 0.0]])
    d = A.sum(axis=1)
    C = -0.25 * (np.diag(d) - A)
    As = [np.outer(e, e) for e in np.eye(2)]
    b = np.ones(2)
    model = dense_model(C, As, b)
    res = solve_model(
        model, 1,
        fprec=0.0, gtol=1e-8, objtol=1e-8, ptol=1e-8,
        prior_trace_bound=2.0, printlevel=0,
    )
    assert abs(res["obj"] - (-1.0)) < 1e-6


def test_sturm_tridiag_min_eig_device():
    from sdplrplus_tpu.ops.lanczos import tridiag_min_eig_device

    rng = np.random.default_rng(4)
    for k in [1, 2, 5, 17, 40]:
        q_max = 64
        alpha = np.zeros(q_max)
        beta = np.zeros(q_max)
        alpha[:k] = rng.normal(size=k) * 3
        beta[: max(k - 1, 0)] = rng.normal(size=max(k - 1, 0))
        T = np.diag(alpha[:k]) + np.diag(beta[: k - 1], 1) + np.diag(beta[: k - 1], -1)
        ref = np.linalg.eigvalsh(T)[0] if k > 0 else 0.0
        est = float(
            tridiag_min_eig_device(
                jnp.asarray(alpha), jnp.asarray(beta), jnp.int32(k)
            )
        )
        assert abs(est - ref) < 1e-10 * max(1.0, abs(ref)), (k, est, ref)


def test_dense_mode_matches_sparse_ops():
    """Dense MXU mode (compile.py dense-mode selection) must reproduce the
    gather-path ops exactly: A_uu / A_uv / A_linesearch / apply_S."""
    import scipy.sparse as sp

    from sdplrplus_tpu import SDPProblem, compile_problem
    from sdplrplus_tpu.models import make_random_graph, maxcut, minimum_bisection
    from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri, gradient
    from sdplrplus_tpu.ops.device import to_device
    from sdplrplus_tpu.ops.forward import A_linesearch, A_uu, A_uv

    rng = np.random.default_rng(11)
    for builder in (maxcut, minimum_bisection):
        A = make_random_graph(24, 0.4, seed=5)
        C, As, b = builder(A)
        prob = SDPProblem(C, list(As), b, None)
        cps = compile_problem(prob, dense=False)
        cpd = compile_problem(prob, dense=True)
        assert cpd.C_dense is not None and cps.C_dense is None
        dps = to_device(cps, jnp.float64)
        dpd = to_device(cpd, jnp.float64)
        r = 3
        R = jnp.asarray(np.pad(rng.normal(size=(24, r)), ((0, cps.n_pad - 24), (0, 0))))
        D = jnp.asarray(np.pad(rng.normal(size=(24, r)), ((0, cps.n_pad - 24), (0, 0))))
        np.testing.assert_allclose(A_uu(dpd, R), A_uu(dps, R), rtol=1e-12)
        np.testing.assert_allclose(A_uv(dpd, R, D), A_uv(dps, R, D), rtol=1e-12)
        ls_d = A_linesearch(dpd, R, D)
        ls_s = A_linesearch(dps, R, D)
        np.testing.assert_allclose(ls_d[0], ls_s[0], rtol=1e-12)
        np.testing.assert_allclose(ls_d[1], ls_s[1], rtol=1e-12)
        m = cps.m
        lam = jnp.asarray(rng.normal(size=m))
        y_full = jnp.concatenate([lam, jnp.ones(1)])
        s_tri = assemble_s_tri(dps, y_full)
        np.testing.assert_allclose(
            apply_S(dpd, s_tri, y_full, R), apply_S(dps, s_tri, y_full, R),
            rtol=1e-12, atol=1e-12,
        )


def test_dense_mode_rejects_offdiagonal():
    import scipy.sparse as sp

    from sdplrplus_tpu import SDPProblem, compile_problem
    from sdplrplus_tpu.models import lovasz_theta, make_random_graph

    A = make_random_graph(10, 0.5, seed=2)
    C, As, b = lovasz_theta(A)
    prob = SDPProblem(C, list(As), np.asarray(b, dtype=np.float64), None)
    with pytest.raises(ValueError):
        compile_problem(prob, dense=True)
    cp = compile_problem(prob)  # auto must fall back to sparse
    assert cp.C_dense is None


def test_lbfgs_compact_matches_two_loop():
    """The compact (Byrd–Nocedal) direction must equal the two-loop
    recursion exactly (same H, H0=I) — including empty ring slots and
    wraparound overwrite order."""
    from sdplrplus_tpu.solver.lbfgs import (
        lbfgs_direction, lbfgs_init, lbfgs_push,
    )

    rng = np.random.default_rng(3)
    k, n_pad, r = 4, 16, 3
    st = lbfgs_init(k, n_pad, r, jnp.float64)
    G = jnp.asarray(rng.normal(size=(n_pad, r)))
    # progressively fill 7 pairs (wraps the k=4 ring) and compare at each fill
    for step in range(7):
        d_two = lbfgs_direction(st, G, k, compact=False)
        d_cmp = lbfgs_direction(st, G, k, compact=True)
        np.testing.assert_allclose(
            np.asarray(d_cmp), np.asarray(d_two), rtol=1e-11, atol=1e-12,
            err_msg=f"fill step {step}",
        )
        alpha = float(rng.uniform(0.1, 1.0))
        direction = jnp.asarray(rng.normal(size=(n_pad, r)))
        G_new = jnp.asarray(rng.normal(size=(n_pad, r)))
        st = lbfgs_push(st, alpha, direction, G, G_new, k)
        G = G_new


def test_lbfgs_impl_e2e_equivalence():
    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import make_random_graph, maxcut

    A = make_random_graph(20, 0.5, seed=9)
    C, As, b = maxcut(A)
    kw = dict(objtol=1e-3, ptol=1e-3, prior_trace_bound=20.0, printlevel=0)
    rc = sdplr(C, As, b, 4, lbfgs_impl="compact", **kw)
    rt = sdplr(C, As, b, 4, lbfgs_impl="two_loop", **kw)
    assert rc["iter"] == rt["iter"]
    assert abs(rc["obj"] - rt["obj"]) < 1e-7 * max(1.0, abs(rt["obj"]))


def test_symlowrank_norms_and_access():
    """norm(2/inf), getindex, matvec parity with the dense expansion
    (reference: test/symlowrank.jl:2-15 randomized norm checks)."""
    rng = np.random.default_rng(8)
    for _ in range(20):
        n, s = int(rng.integers(3, 30)), int(rng.integers(1, 4))
        B = rng.normal(size=(n, s))
        d = rng.normal(size=s)
        A = SymLowRank(B, d)
        D = A.todense()
        assert abs(A.norm(2) - np.linalg.norm(D)) < 1e-10
        assert abs(A.norm(np.inf) - np.abs(D).max()) < 1e-10
        i, j = int(rng.integers(n)), int(rng.integers(n))
        assert abs(A[i, j] - D[i, j]) < 1e-12
        x = rng.normal(size=n)
        np.testing.assert_allclose(A.matvec(x), D @ x, rtol=1e-12)
