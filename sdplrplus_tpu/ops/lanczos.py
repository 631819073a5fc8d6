"""Jitted Lanczos min-eigenvalue estimation for the dual bound.

TPU-native re-design of the reference's randomized Lanczos
(reference: src/coreop.jl:461-514) and its high-precision GenericArpack
alternative (src/coreop.jl:351-374). The 3-term recurrence runs as a
device-side lax.fori_loop whose matvec is the adjoint SpMM with r = 1;
only the tiny (q,) α/β arrays come back to the host, where the
tridiagonal eigenproblem is solved directly (scipy eigh_tridiagonal).

The high-precision path replaces Arpack with Lanczos + full
reorthogonalization (per SURVEY §7 step 5), which for λ_min of these
well-conditioned shifted S matrices reaches the same 1e-6 tolerances.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .adjoint import apply_S
from .device import DeviceProblem
from .forward import _psum


def _n_loc(dp: DeviceProblem) -> int:
    """Local row count: n_pad single-device, the shard block under
    shard_map (derived from a row-blocked problem array)."""
    ell = getattr(dp, "ell_cols", None)
    return int(ell.shape[0]) if ell is not None else dp.n_pad


def _row_mask(dp: DeviceProblem, dtype):
    n_loc = _n_loc(dp)
    idx = lax.broadcasted_iota(jnp.int32, (n_loc, 1), 0)
    if dp.spmd_axis is not None:
        idx = idx + lax.axis_index(dp.spmd_axis) * n_loc
    return (idx < dp.n).astype(dtype)


def _lanczos_v0(dp: DeviceProblem, key, dtype):
    """Random unit start vector (reference: src/coreop.jl:469-471), row-
    sharded under shard_map. Every shard draws the FULL (n_pad,) vector
    from the same key and slices its block, so the sharded run is exactly
    the single-device run (n_pad scalars of redundant RNG per shard)."""
    v_full = jax.random.normal(key, (dp.n_pad, 1), dtype=dtype)
    if dp.spmd_axis is not None:
        n_loc = _n_loc(dp)
        start = lax.axis_index(dp.spmd_axis) * n_loc
        v = lax.dynamic_slice(
            v_full, (start, jnp.zeros((), start.dtype)), (n_loc, 1)
        )
    else:
        v = v_full
    v = v * _row_mask(dp, dtype)
    return v / jnp.sqrt(_psum(jnp.sum(v * v), dp))


def lanczos_alpha_beta_impl(
    dp: DeviceProblem, s_tri, y_full, key, q, *, q_max: int, S_dense=None
):
    """Run min(q, q_max) Lanczos iterations on S; returns (alpha, beta, k_eff).

    alpha/beta are (q_max,) with valid prefix of length k_eff; β breakdown
    (|β| < √n·eps, reference: src/coreop.jl:494) stops the recurrence.
    Under shard_map v is row-sharded and every inner product psums.
    ``S_dense``: pre-assembled dense S (entry mode,
    ops/entrymask.assemble_S_dense) — each matvec becomes one MXU matmul.
    """
    dtype = s_tri.dtype
    v = _lanczos_v0(dp, key, dtype)

    def matvec(v):
        if S_dense is not None:
            from .forward import _full

            # entry mode: S_dense rows are the local shard; gather v rows
            return S_dense @ _full(dp, v)
        return apply_S(dp, s_tri, y_full, v)

    breakdown_tol = jnp.sqrt(jnp.asarray(dp.n, dtype)) * jnp.finfo(dtype).eps

    def body(i, carry):
        v, v_prev, beta_prev, alpha, beta, done, k_eff = carry
        Av = matvec(v)
        a_i = _psum(jnp.vdot(v, Av), dp)
        Av = Av - a_i * v - beta_prev * v_prev
        b_i = jnp.sqrt(_psum(jnp.sum(Av * Av), dp))
        active = jnp.logical_and(jnp.logical_not(done), i < q)
        alpha = jnp.where(active, alpha.at[i].set(a_i), alpha)
        beta = jnp.where(active, beta.at[i].set(b_i), beta)
        k_eff = jnp.where(active, i + 1, k_eff)
        brk = b_i < breakdown_tol
        done = jnp.logical_or(done, jnp.logical_or(brk, jnp.logical_not(active)))
        v_new = jnp.where(done, v, Av / jnp.maximum(b_i, jnp.finfo(dtype).tiny))
        v_prev_new = jnp.where(done, v_prev, v)
        beta_prev_new = jnp.where(done, beta_prev, b_i)
        return v_new, v_prev_new, beta_prev_new, alpha, beta, done, k_eff

    alpha0 = jnp.zeros((q_max,), dtype=dtype)
    beta0 = jnp.zeros((q_max,), dtype=dtype)
    init = (
        v,
        jnp.zeros_like(v),
        jnp.zeros((), dtype=dtype),
        alpha0,
        beta0,
        jnp.zeros((), bool),
        jnp.zeros((), jnp.int32),
    )
    _, _, _, alpha, beta, _, k_eff = lax.fori_loop(0, q_max, body, init)
    return alpha, beta, k_eff


lanczos_alpha_beta = functools.partial(jax.jit, static_argnames=("q_max",))(
    lanczos_alpha_beta_impl
)


def lanczos_alpha_beta_reorth_impl(
    dp: DeviceProblem, s_tri, y_full, key, *, q_max: int, S_dense=None
):
    """Lanczos with full reorthogonalization (high-precision path).
    Under shard_map the Krylov basis V is row-sharded like v."""
    dtype = s_tri.dtype
    v = _lanczos_v0(dp, key, dtype)

    def matvec(v):
        if S_dense is not None:
            from .forward import _full

            # entry mode: S_dense rows are the local shard; gather v rows
            return S_dense @ _full(dp, v)
        return apply_S(dp, s_tri, y_full, v)

    V0 = jnp.zeros((q_max, v.shape[0]), dtype=dtype)

    def body(i, carry):
        v, v_prev, beta_prev, alpha, beta, V, done, k_eff = carry
        V = jnp.where(done, V, V.at[i].set(v[:, 0]))
        Av = matvec(v)
        a_i = _psum(jnp.vdot(v, Av), dp)
        Av = Av - a_i * v - beta_prev * v_prev
        # full reorthogonalization against all previous vectors (twice)
        for _ in range(2):
            coeffs = _psum(V @ Av, dp)  # (q_max, 1)
            Av = Av - V.T @ coeffs
        b_i = jnp.sqrt(_psum(jnp.sum(Av * Av), dp))
        active = jnp.logical_not(done)
        alpha = jnp.where(active, alpha.at[i].set(a_i), alpha)
        beta = jnp.where(active, beta.at[i].set(b_i), beta)
        k_eff = jnp.where(active, i + 1, k_eff)
        brk = b_i < jnp.sqrt(jnp.asarray(dp.n, dtype)) * jnp.finfo(dtype).eps
        done = jnp.logical_or(done, brk)
        v_new = jnp.where(done, v, Av / jnp.maximum(b_i, jnp.finfo(dtype).tiny))
        v_prev_new = jnp.where(done, v_prev, v)
        beta_prev_new = jnp.where(done, beta_prev, b_i)
        return v_new, v_prev_new, beta_prev_new, alpha, beta, V, done, k_eff

    init = (
        v,
        jnp.zeros_like(v),
        jnp.zeros((), dtype=dtype),
        jnp.zeros((q_max,), dtype=dtype),
        jnp.zeros((q_max,), dtype=dtype),
        V0,
        jnp.zeros((), bool),
        jnp.zeros((), jnp.int32),
    )
    out = lax.fori_loop(0, q_max, body, init)
    _, _, _, alpha, beta, _, _, k_eff = out
    return alpha, beta, k_eff


lanczos_alpha_beta_reorth = functools.partial(
    jax.jit, static_argnames=("q_max",)
)(lanczos_alpha_beta_reorth_impl)


def tridiag_min_eig_resid(
    alpha: np.ndarray, beta: np.ndarray, k_eff: int
) -> tuple:
    """(θ_min, margin) for the leading k_eff block of the Lanczos
    tridiagonal — host-side, float64.

    θ_min is the smallest Ritz value; it is an UPPER bound on λ_min(S)
    (Rayleigh–Ritz), so the raw value can over-certify the dual bound
    (the round-1 negative-duality-gap bug). ``margin`` is the residual
    safeguard β_k·|s_k| (‖S·Vs − θ·Vs‖ for the Ritz pair) plus a few-ulp
    slack for the finite-precision recurrence; ``θ_min − margin`` is the
    safeguarded estimate used for the certified dual value. The
    reference uses the raw Ritz value (src/coreop.jl:503-511) — this is
    deliberately stricter.
    """
    k = int(k_eff)
    if k <= 0:
        return 0.0, 0.0
    a = np.asarray(alpha[:k], dtype=np.float64)
    bfull = np.asarray(beta[:k], dtype=np.float64)
    scale = float(np.max(np.abs(a)) + 2.0 * np.max(np.abs(bfull))) + 1.0
    slack = 32.0 * float(np.finfo(np.asarray(alpha).dtype).eps) * scale
    if k == 1:
        return float(a[0]), abs(float(bfull[0])) + slack
    b = bfull[: k - 1]
    try:
        from scipy.linalg import eigh_tridiagonal

        w, v = eigh_tridiagonal(a, b, select="i", select_range=(0, 0))
        theta, s_last = float(w[0]), float(v[-1, 0])
    except Exception:
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        w, V = np.linalg.eigh(T)
        theta, s_last = float(w[0]), float(V[-1, 0])
    margin = abs(float(bfull[k - 1])) * abs(s_last) + slack
    return theta, margin


def tridiag_min_eig(alpha: np.ndarray, beta: np.ndarray, k_eff: int) -> float:
    """Smallest eigenvalue of the k_eff×k_eff symmetric tridiagonal matrix
    (host-side; equivalent of the reference's symeigs(:SA) on the
    SymTridiagonal, src/coreop.jl:503-511)."""
    k = int(k_eff)
    if k <= 0:
        return 0.0
    a = np.asarray(alpha[:k], dtype=np.float64)
    if k == 1:
        return float(a[0])
    b = np.asarray(beta[: k - 1], dtype=np.float64)
    try:
        from scipy.linalg import eigh_tridiagonal

        w = eigh_tridiagonal(a, b, select="i", select_range=(0, 0))[0]
        return float(w[0])
    except Exception:
        T = np.diag(a) + np.diag(b, 1) + np.diag(b, -1)
        return float(np.linalg.eigvalsh(T)[0])


def lanczos_q(iter_count: int, n: int) -> int:
    """Iteration budget q = 2·⌈max(iter,100)^0.5 · log n⌉ (reference:
    src/coreop.jl:402,465). Capped at n (NOT n-1 like the reference): the
    full-Krylov run makes the tridiagonal eigenproblem exact on small
    problems, which the certified dual bound needs — at q = n-1 the
    residual-safeguarded estimate can still overshoot λ_min."""
    q = int(2 * np.ceil(np.sqrt(max(iter_count, 100)) * np.log(max(n, 2))))
    return max(min(q, n), 1)


def bucket_q_max(q: int, base: int = 64) -> int:
    """Round q up to a power-of-two multiple of ``base`` to bound the number
    of jit specializations as q grows with the iteration count."""
    q_max = base
    while q_max < q:
        q_max *= 2
    return q_max


def tridiag_min_eig_device(alpha, beta, k_eff, iters: int = 80):
    """Smallest eigenvalue of the leading k_eff block of the symmetric
    tridiagonal (alpha, beta) — jittable Sturm-sequence bisection, the
    on-device replacement for the host eigensolver so the whole major
    iteration (dual bound included) can run inside one compiled program.

    The Sturm count (number of eigenvalues < x) uses the standard LDLᵀ
    recurrence d_i = (a_i - x) - b_{i-1}²/d_{i-1}; rows past k_eff are
    masked out. ~iters bisection steps give ~1e-12 relative accuracy.
    """
    q_max = alpha.shape[0]
    dtype = alpha.dtype
    idx = jnp.arange(q_max)
    active = idx < k_eff
    a = jnp.where(active, alpha, 0.0)
    b2 = jnp.where(idx + 1 < k_eff, beta * beta, 0.0)  # b2[i] couples i,i+1

    # Gershgorin bounds over active rows
    babs = jnp.where(idx + 1 < k_eff, jnp.abs(beta), 0.0)
    rad = babs + jnp.concatenate([jnp.zeros((1,), dtype), babs[:-1]])
    big = jnp.asarray(jnp.finfo(dtype).max / 4, dtype)
    lo = jnp.min(jnp.where(active, a - rad, big))
    hi = jnp.max(jnp.where(active, a + rad, -big))
    hi = jnp.maximum(hi, lo + jnp.finfo(dtype).eps)

    tiny = jnp.asarray(jnp.finfo(dtype).tiny * 4, dtype)

    def count_below(x):
        def body(i, carry):
            d_prev, cnt = carry
            d = (a[i] - x) - jnp.where(i > 0, b2[i - 1], 0.0) / d_prev
            d = jnp.where(jnp.abs(d) < tiny, -tiny, d)
            cnt = cnt + jnp.where(jnp.logical_and(active[i], d < 0), 1, 0)
            d = jnp.where(active[i], d, jnp.asarray(1.0, dtype))
            return d, cnt
        _, cnt = lax.fori_loop(0, q_max, body, (jnp.asarray(1.0, dtype), 0))
        return cnt

    def bisect(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        below = count_below(mid) >= 1
        return jnp.where(below, lo, mid), jnp.where(below, mid, hi)

    lo, hi = lax.fori_loop(0, iters, bisect, (lo, hi))
    return 0.5 * (lo + hi)


def _tridiag_solve(d, e, rhs, active):
    """Thomas-algorithm solve of the tridiagonal system diag(d) +
    off-diag(e) (e[i] couples rows i, i+1); rows past the active prefix
    are identity. Pivots are clamped away from zero so a shift AT the
    eigenvalue still produces a finite (huge, correctly-directed)
    inverse-iteration step — exactly what inverse iteration wants."""
    q_max = d.shape[0]
    dtype = d.dtype
    scale = jnp.max(jnp.abs(d)) + 2.0 * jnp.max(jnp.abs(e)) + 1.0
    tiny = jnp.finfo(dtype).eps * scale

    def clamp(x):
        return jnp.where(
            jnp.abs(x) < tiny, jnp.where(x < 0, -tiny, tiny), x
        )

    def fwd(i, carry):
        dd, bb = carry
        w = jnp.where(i > 0, e[i - 1] / dd[i - 1], jnp.zeros((), dtype))
        ddi = clamp(d[i] - w * jnp.where(i > 0, e[i - 1], 0.0))
        bbi = rhs[i] - w * bb[i - 1]
        return dd.at[i].set(ddi), bb.at[i].set(bbi)

    dd0 = jnp.ones((q_max,), dtype)
    dd, bb = lax.fori_loop(0, q_max, fwd, (dd0, jnp.zeros((q_max,), dtype)))

    def bwd(j, x):
        i = q_max - 1 - j
        xi = (bb[i] - jnp.where(i + 1 < q_max, e[i] * x[i + 1], 0.0)) / dd[i]
        return x.at[i].set(xi)

    x = lax.fori_loop(0, q_max, bwd, jnp.zeros((q_max,), dtype))
    return jnp.where(active, x, 0.0)


def tridiag_min_eig_device_certified(alpha, beta, k_eff, iters: int = 80):
    """(θ_min, margin) — device analog of ``tridiag_min_eig_resid``:
    Sturm bisection for the smallest Ritz value, then two inverse-
    iteration solves (Thomas algorithm) for the eigenvector's last
    component, giving the residual safeguard margin β_k·|s_k| + slack.
    The certified λ_min estimate is θ_min − margin; the fused driver's
    dual bound uses it so convergence certificates stay valid
    (round-1 fix: raw Ritz values over-shot λ_min on 7/36 sweep runs)."""
    q_max = alpha.shape[0]
    dtype = alpha.dtype
    theta = tridiag_min_eig_device(alpha, beta, k_eff, iters)

    idx = jnp.arange(q_max)
    active = idx < k_eff
    e = jnp.where(idx + 1 < k_eff, beta, 0.0)
    d = jnp.where(active, alpha - theta, jnp.ones((), dtype))

    nrm = lambda v: jnp.sqrt(jnp.maximum(jnp.sum(v * v), jnp.finfo(dtype).tiny))
    x = jnp.where(active, jnp.ones((q_max,), dtype), 0.0)
    x = x / nrm(x)
    for _ in range(2):
        x = _tridiag_solve(d, e, x, active)
        x = x / nrm(x)

    last = jnp.sum(jnp.where(idx == k_eff - 1, x, 0.0))
    beta_last = jnp.sum(jnp.where(idx == k_eff - 1, beta, 0.0))
    scale = (
        jnp.max(jnp.abs(jnp.where(active, alpha, 0.0)))
        + 2.0 * jnp.max(jnp.abs(e))
        + 1.0
    )
    slack = 32.0 * jnp.finfo(dtype).eps * scale
    margin = jnp.abs(beta_last) * jnp.abs(last) + slack
    return theta, jnp.where(k_eff > 0, margin, jnp.zeros((), dtype))
