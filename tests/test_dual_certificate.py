"""Certified dual bound: the Lanczos residual safeguard.

Round-1 regression: the raw Lanczos Ritz value is an UPPER bound on
λ_min(S), so the dual value -y·b + tb·min(θ,0) could exceed the true
dual and 7/36 sweep runs reported negative duality gaps. The fix
subtracts the Ritz residual β_k·|s_k| (tridiag_min_eig_resid /
tridiag_min_eig_device_certified) before forming the dual value.
"""

import numpy as np
import pytest

from sdplrplus_tpu import SolverConfig, sdplr
from sdplrplus_tpu.models import lovasz_theta, make_random_graph, maxcut
from sdplrplus_tpu.ops.lanczos import (
    tridiag_min_eig,
    tridiag_min_eig_device_certified,
    tridiag_min_eig_resid,
)


def _numpy_lanczos(A, q, seed=0):
    """Plain 3-term Lanczos on a dense symmetric A; returns (alpha, beta)
    of length q (beta[q-1] is the residual β_k of the Lanczos relation)."""
    rng = np.random.default_rng(seed)
    n = A.shape[0]
    v = rng.normal(size=n)
    v /= np.linalg.norm(v)
    v_prev = np.zeros(n)
    beta_prev = 0.0
    alpha = np.zeros(q)
    beta = np.zeros(q)
    for i in range(q):
        w = A @ v
        alpha[i] = v @ w
        w = w - alpha[i] * v - beta_prev * v_prev
        beta[i] = np.linalg.norm(w)
        v_prev, v = v, w / max(beta[i], 1e-300)
        beta_prev = beta[i]
    return alpha, beta


@pytest.mark.parametrize("q", [3, 5, 10, 25])
def test_underconverged_lanczos_never_overcertifies(q):
    """For ANY iteration count, θ - margin must stay ≤ λ_min(A): the
    certified estimate never over-shoots, even when Lanczos has barely
    started (q=3 on a 60-dim matrix)."""
    rng = np.random.default_rng(42)
    n = 60
    M = rng.normal(size=(n, n))
    A = (M + M.T) / 2.0
    lam_min = float(np.linalg.eigvalsh(A)[0])
    alpha, beta = _numpy_lanczos(A, q)
    theta, margin = tridiag_min_eig_resid(alpha, beta, q)
    # Rayleigh-Ritz: the raw Ritz value upper-bounds λ_min
    assert theta >= lam_min - 1e-10
    # the safeguarded estimate lower-bounds it
    assert theta - margin <= lam_min + 1e-10


def test_resid_margin_vanishes_on_convergence():
    """Once Lanczos converges, the margin is ~0 and the certified value
    equals λ_min — the safeguard costs nothing at convergence."""
    rng = np.random.default_rng(7)
    n = 40
    M = rng.normal(size=(n, n))
    A = (M + M.T) / 2.0
    lam_min = float(np.linalg.eigvalsh(A)[0])
    alpha, beta = _numpy_lanczos(A, n)  # full Krylov space
    theta, margin = tridiag_min_eig_resid(alpha, beta, n)
    assert abs(theta - lam_min) < 1e-8
    assert margin < 1e-6 * (1.0 + abs(lam_min))


def test_device_certified_matches_host():
    """Device Sturm-bisection + inverse-iteration path reproduces the
    host scipy (θ, margin) pair."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    q_max = 32
    for k_eff in [1, 2, 7, 20, 32]:
        alpha = np.zeros(q_max)
        beta = np.zeros(q_max)
        alpha[:k_eff] = rng.normal(size=k_eff)
        beta[:k_eff] = np.abs(rng.normal(size=k_eff)) + 0.1
        th_h, mg_h = tridiag_min_eig_resid(alpha, beta, k_eff)
        th_d, mg_d = tridiag_min_eig_device_certified(
            jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(k_eff)
        )
        assert abs(float(th_d) - th_h) < 1e-8 * (1 + abs(th_h))
        assert abs(float(mg_d) - mg_h) < 1e-6 * (1 + abs(mg_h)), (
            k_eff, mg_h, float(mg_d),
        )
        # raw path still agrees on θ
        th_raw = tridiag_min_eig(alpha, beta, k_eff)
        assert abs(th_raw - th_h) < 1e-8 * (1 + abs(th_h))


def _assert_valid_gap(res):
    assert res["min_duality_gap"] >= -1e-8, res["min_duality_gap"]
    # the reported best dual never exceeds the primal objective
    # (equality holds only at a zero gap)
    obj, dual = res["obj"], res["max_dual_value"]
    assert dual <= obj + 1e-8 * (1 + abs(obj)), (obj, dual)


@pytest.mark.parametrize("fused", [True, False])
def test_e2e_gap_never_negative_theta(fused):
    """Lovász-θ (the family that produced negative gaps in round 1):
    converged solves must report a non-negative duality gap."""
    A = make_random_graph(16, 0.4, seed=5)
    C, As, b = lovasz_theta(A)
    res = sdplr(
        C, As, b, 4,
        ptol=1e-3, objtol=1e-3, prior_trace_bound=1.0,
        printlevel=0, fused_outer=fused, maxmajoriter=200,
    )
    _assert_valid_gap(res)


def test_e2e_gap_never_negative_maxcut():
    A = make_random_graph(12, 0.5, seed=9)
    C, As, b = maxcut(A)
    res = sdplr(
        C, As, b, 3, ptol=1e-3, objtol=1e-3, prior_trace_bound=12.0,
        printlevel=0, maxmajoriter=200,
    )
    _assert_valid_gap(res)


def test_rank_doubling_warm_and_restart_agree():
    """Warm-started rank doubling (default) reaches the same optimum as
    the reference's restart semantics on the C5 maxcut (optimum rank 2,
    started at r=1)."""
    import scipy.sparse as sp

    n = 5
    rows = np.arange(n)
    cols = (rows + 1) % n
    A = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, n))
    A = A + A.T
    C, As, b = maxcut(A)
    objs = {}
    for mode in ("warm", "restart"):
        res = sdplr(
            C, As, b, 1,
            ptol=1e-4, objtol=1e-4, rankupd_tol=1,
            prior_trace_bound=5.0, printlevel=0, maxmajoriter=80,
            rank_update_mode=mode,
        )
        assert res["r"] > 1
        _assert_valid_gap(res)
        objs[mode] = res["obj"]
    assert abs(objs["warm"] - objs["restart"]) < 1e-2 * (
        1 + abs(objs["restart"])
    )
