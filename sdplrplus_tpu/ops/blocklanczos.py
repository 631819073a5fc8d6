"""Block Lanczos min-eigenvalue estimation for the dual bound.

Lane-batched redesign of the scalar Lanczos dual bound (ops/lanczos.py;
reference: src/coreop.jl:461-514). The gather SpMM that implements the
S-matvec costs the SAME per pass for 1..64 lanes (ops/spmm.py design
notes: ~3 ns per gathered index, lane width free), so a rank-1 Krylov
recurrence wastes ~98% of the hardware's lane headroom. This module
runs the recurrence on an (n, b) BLOCK instead:

  * each block step is ONE operator pass carrying b Krylov vectors,
  * the start block is seeded with the primal factor R: at a strict
    feasibility boundary the dual bound is evaluated at the LS
    multiplier y = argmin ‖S(y)R‖_F (solver/dualbound.ls_dual_head),
    so range(R) already spans the near-null eigenvectors of S and the
    Ritz values converge in a few block steps instead of the
    reference's q = 2⌈√iter·log n⌉ ≈ 10³ scalar iterations,
  * the projected block-tridiagonal T_k is solved on device by masked
    Householder tridiagonalization + the proven Sturm-bisection /
    inverse-iteration kernels (ops/lanczos.tridiag_min_eig_device,
    _tridiag_solve) — jnp.linalg.eigh never compiles in a while_loop
    on this backend,
  * the loop exits EARLY once the residual safeguard is good enough:
    trace_bound·margin ≤ margin_target (a fraction of the objective
    tolerance budget) or θ − margin ≥ 0 (λ_min clearly nonnegative, so
    min(λ_min, 0) contributes nothing to the dual value regardless).

The certified estimate is the same safeguarded form as the scalar path:
θ_min − ‖B_k s_last‖ − slack, where B_k is the first off-diagonal block
beyond the truncation and s_last the Ritz vector's trailing block
(the block analog of the β_k·|s_k| residual bound).

The basis is kept explicitly and fully reorthogonalized every step
(two-pass, MXU matmuls against the stored (k, n_loc, b) history), so the
f32 recurrence cannot drift into ghost eigenvalues; memory is
k_max·b·n_loc floats (≤ 512 Krylov vectors — ~200 MB at n = 10⁵, the
same budget as the scalar high-precision reorthogonalized path).

Under shard_map all basis blocks are row-sharded and every inner product
psums — identical semantics single-device and multi-device.
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
from .lanczos import _row_mask, tridiag_min_eig_device, _tridiag_solve


def block_sizes(n: int, r: int, block: int = 0) -> tuple:
    """(b, k_max) for a problem of size n with current primal rank r.

    ``block`` > 0 forces the block size. Defaults: b covers the factor's
    rank sketch plus a few random exploration lanes, rounded to the
    8-lane granularity of the VPU and capped at 32; k_max caps the total
    subspace at min(512, ~n/2) columns."""
    if block > 0:
        b = block
    else:
        b = min(32, max(16, 8 * ((min(r, 24) + 4 + 7) // 8)))
    k_max = max(4, min(512 // b, max(8, n // (2 * b))))
    return b, k_max


def _seed_block(dp: DeviceProblem, key, R, b: int, dtype):
    """Start block: a random sketch of range(R) in the first lanes (the
    near-null space of S at the LS multiplier) plus fresh random lanes.
    Row-masked; NOT yet orthonormal (the caller CholQR-orthonormalizes).

    Under shard_map every shard draws the FULL (n_pad, b) random block
    from the same key and slices its row block (like ops/lanczos
    _lanczos_v0), so the sharded run equals the single-device run."""
    n_loc = dp.ell_cols.shape[0] if getattr(dp, "ell_cols", None) is not None \
        else dp.n_pad
    k1, k2 = jax.random.split(key)
    V_full = jax.random.normal(k2, (dp.n_pad, b), dtype=dtype)
    if dp.spmd_axis is not None:
        start = lax.axis_index(dp.spmd_axis) * n_loc
        V = lax.dynamic_slice(
            V_full, (start, jnp.zeros((), start.dtype)), (n_loc, b)
        )
    else:
        V = V_full
    if R is not None and R.shape[1] > 0:
        r = R.shape[1]
        b1 = min(r, max(b - 4, 1))
        G = jax.random.normal(k1, (r, b1), dtype=dtype)
        # scale the sketch to unit-ish column norms so the random lanes
        # don't numerically drown it in the Gram matrix
        sk = R @ G
        nrm = jnp.sqrt(jnp.maximum(
            _psum(jnp.sum(sk * sk, axis=0), dp), jnp.finfo(dtype).tiny))
        V = V.at[:, :b1].set(sk / nrm)
    return V * _row_mask(dp, dtype)


def _cholqr(dp: DeviceProblem, W, eps_scale):
    """Column-scaled CholQR: W = Q·Bᵀ with Q orthonormal (psum'd Gram
    under shard_map). Returns (Q, B, fail) where B is upper-triangular
    and ``fail`` flags a rank-deficient block (invariant subspace
    reached).

    The Gram matrix is normalized by the column norms before the
    Cholesky so the rank test is SCALE-INVARIANT: after an R-seeded
    start the converged lanes' residual columns are orders of magnitude
    smaller than the random lanes', and an unscaled test would declare
    spurious rank deficiency on the first step. On fail the (jittered)
    B is still returned — its norm over-estimates ‖W‖, so the residual
    margin built from it stays conservative, while Q is unused (the
    recurrence stops)."""
    dtype = W.dtype
    G = _psum(W.T @ W, dp)
    b = G.shape[0]
    eps = jnp.finfo(dtype).eps
    d = jnp.sqrt(jnp.diagonal(G))
    dmax = jnp.max(d)
    # normalization clamp: columns more than ~3 decades below the
    # block's largest are rounding noise — boosting them to unit scale
    # would inject fake Krylov directions that corrupt T. Clamping their
    # normalizer keeps them small in Gn, so genuine convergence of the
    # whole block shows up as rank deficiency (fail) instead.
    floor = jnp.maximum(1024.0 * eps * dmax, eps * (eps_scale + 1.0))
    ds = jnp.maximum(d, floor)
    Gn = G / (ds[:, None] * ds[None, :])
    jit = 4.0 * eps
    Ln = jnp.linalg.cholesky(Gn + jit * jnp.eye(b, dtype=dtype))
    dmin = jnp.min(jnp.abs(jnp.diagonal(Ln)))
    fail = (
        jnp.logical_not(jnp.isfinite(dmin))
        | (dmin * dmin <= 16.0 * jit)
        | jnp.logical_not(dmax > eps * (eps_scale + 1.0))
    )
    Ln_safe = jnp.where(jnp.isfinite(Ln), Ln, 0.0)
    Ln_safe = jnp.where(fail, jnp.eye(b, dtype=dtype), Ln_safe)
    # G = (D·Ln)(D·Ln)ᵀ, so W = Q·Bᵀ with B = Lnᵀ·D and
    # Q = (W·D⁻¹)·Ln⁻ᵀ orthonormal
    Q = lax.linalg.triangular_solve(
        Ln_safe, W / ds[None, :], left_side=False, lower=True,
        transpose_a=True,
    )
    B = jnp.where(jnp.isfinite(Ln), Ln, 0.0).T * ds[None, :]
    return Q, B, fail


def householder_tridiagonalize(T):
    """Masked-shape Householder reduction of the symmetric (p, p) matrix
    T to tridiagonal form, accumulating the orthogonal basis Q so Ritz
    vectors can be mapped back: T = Q · tri(alpha, beta) · Qᵀ.

    Deterministic and breakdown-free — the device replacement for
    jnp.linalg.eigh (which does not compile inside while_loops on this
    backend). Zero-coupled trailing blocks (the masked inactive region)
    stay exactly decoupled: their Householder vectors are identically
    zero."""
    p = T.shape[0]
    dtype = T.dtype
    idx = jnp.arange(p)

    def body(j, carry):
        T, Q = carry
        x = jnp.where(idx > j, T[:, j], 0.0)
        xnorm = jnp.sqrt(jnp.sum(x * x))
        pivot = jnp.sum(jnp.where(idx == j + 1, x, 0.0))
        sign = jnp.where(pivot >= 0, 1.0, -1.0).astype(dtype)
        e1 = (idx == j + 1).astype(dtype)
        v = x + sign * xnorm * e1
        vnorm2 = jnp.sum(v * v)
        # skip the rotation entirely when the column is already reduced
        act = vnorm2 > jnp.finfo(dtype).tiny * p
        tau = jnp.where(act, 2.0 / jnp.where(act, vnorm2, 1.0), 0.0)
        u = tau * (T @ v)
        w = u - (0.5 * tau * jnp.dot(v, u)) * v
        T = T - jnp.outer(v, w) - jnp.outer(w, v)
        Q = Q - (Q @ v)[:, None] * (tau * v)[None, :]
        return T, Q

    T, Q = lax.fori_loop(0, p - 2, body, (T, jnp.eye(p, dtype=dtype)))
    alpha = jnp.diagonal(T)
    beta = jnp.concatenate(
        [jnp.diagonal(T, offset=1), jnp.zeros((1,), dtype=dtype)]
    )
    return alpha, beta, Q


def block_tridiag_min_eig_certified(A_blocks, B_blocks, k_eff):
    """(θ_min, margin, ok) for the leading k_eff blocks of the block
    tridiagonal (A_blocks diagonal, B_blocks sub-diagonal couplings) —
    entirely on device.

    margin = ‖B_{k_eff-1} · s_last‖ + slack, the block analog of the
    scalar residual safeguard (ops/lanczos.tridiag_min_eig_resid)."""
    k_max, b, _ = A_blocks.shape
    p = k_max * b
    dtype = A_blocks.dtype
    blk = jnp.arange(k_max)
    active_blk = blk < k_eff

    # scale/certainty guards
    scale = (
        jnp.max(jnp.abs(jnp.where(active_blk[:, None, None], A_blocks, 0.0)))
        + 2.0 * jnp.max(jnp.abs(
            jnp.where(active_blk[:, None, None], B_blocks, 0.0)))
        + 1.0
    )

    # assemble masked T: inactive diagonal pushed far above the active
    # spectrum so the global minimum always comes from the active part
    big = 4.0 * scale
    Ad = jnp.where(active_blk[:, None, None], A_blocks, 0.0)
    T = jnp.zeros((p, p), dtype=dtype)
    ii = jnp.arange(k_max) * b

    def put_diag(j, T):
        T = lax.dynamic_update_slice(T, Ad[j], (ii[j], ii[j]))
        return T

    T = lax.fori_loop(0, k_max, put_diag, T)

    # sub/super couplings B_j between blocks j and j+1 (active pairs only)
    Bm = jnp.where((blk[:, None, None] + 1 < k_eff), B_blocks, 0.0)

    def put_off(j, T):
        T = lax.dynamic_update_slice(T, Bm[j], (ii[j] + b, ii[j]))
        T = lax.dynamic_update_slice(T, Bm[j].T, (ii[j], ii[j] + b))
        return T

    T = lax.fori_loop(0, k_max - 1, put_off, T)
    row = jnp.arange(p)
    inactive_row = (row // b) >= k_eff
    T = T + jnp.where(inactive_row, big, 0.0) * jnp.eye(p, dtype=dtype)

    alpha, beta, Q = householder_tridiagonalize(T)
    theta = tridiag_min_eig_device(alpha, beta, jnp.asarray(p, jnp.int32))

    # inverse iteration in the tridiagonal basis, map back through Q
    e = beta[:-1]
    d = alpha - theta
    ones = jnp.ones((p,), dtype)
    nrm = lambda v: jnp.sqrt(jnp.maximum(jnp.sum(v * v),
                                         jnp.finfo(dtype).tiny))
    s = ones / nrm(ones)
    for _ in range(2):
        s = _tridiag_solve(d, e, s, jnp.ones((p,), bool))
        s = s / nrm(s)
    u = Q @ s

    # trailing active block of the Ritz vector -> residual margin
    k0 = jnp.maximum(k_eff - 1, 0).astype(jnp.int32)
    zero = jnp.zeros((), jnp.int32)
    u_last = lax.dynamic_slice(u, (k0 * b,), (b,))
    B_last = lax.dynamic_slice(B_blocks, (k0, zero, zero), (1, b, b))[0]
    res = B_last @ u_last
    slack = 64.0 * jnp.finfo(dtype).eps * scale
    margin = jnp.sqrt(jnp.sum(res * res)) + slack
    ok = k_eff > 0
    return theta, jnp.where(ok, margin, big), ok


def block_lanczos_min_eig_impl(
    dp: DeviceProblem,
    s_tri,
    y_full,
    key,
    R,
    margin_target,
    k_min,
    *,
    b: int,
    k_max: int,
    check_every: int = 2,
    S_dense=None,
):
    """Certified λ_min estimate of S via R-seeded block Lanczos.

    Returns (theta, margin, k_used): the safeguarded estimate is
    θ − margin. The loop stops at the first checked step where
    margin ≤ margin_target, or θ − margin ≥ 0 (λ_min certainly
    nonnegative as far as the dual value cares), or block breakdown, or
    k_max steps. ``k_min`` (traced) forces a minimum Krylov depth.
    """
    dtype = y_full.dtype

    def matvec(V):
        if S_dense is not None:
            from .forward import _full

            return S_dense @ _full(dp, V)
        return apply_S(dp, s_tri, y_full, V)

    V0_raw = _seed_block(dp, key, R, b, dtype)
    V0, _, _ = _cholqr(dp, V0_raw, jnp.asarray(1.0, dtype))
    V0, _, _ = _cholqr(dp, V0, jnp.asarray(1.0, dtype))  # CholQR2
    n_loc = V0.shape[0]

    BIGM = jnp.asarray(np.finfo(np.float32).max / 8, dtype)

    def body(carry):
        (j, V, V_prev, B_prev, hist, A_blocks, B_blocks, theta, margin,
         j_hit, theta_hit, done) = carry
        hist = hist.at[j].set(V)
        W = matvec(V)
        W = W - V_prev @ B_prev.T
        A_j = _psum(V.T @ W, dp)
        A_j = 0.5 * (A_j + A_j.T)
        W = W - V @ A_j
        # full two-pass reorthogonalization against the stored basis
        mask = (jnp.arange(k_max) <= j).astype(dtype)[:, None, None]
        Hm = hist * mask
        for _ in range(2):
            coeffs = _psum(
                jnp.einsum("knb,nc->kbc", Hm, W), dp)  # (k_max, b, b)
            W = W - jnp.einsum("knb,kbc->nc", Hm, coeffs)
        scale = jnp.sqrt(jnp.maximum(_psum(jnp.sum(V * V), dp), 1.0))
        # CholQR2: one pass leaves O(jit/σ_min²) non-orthonormality on
        # borderline blocks, which breaks the θ ≥ λ_min Rayleigh-Ritz
        # interlacing the certificate rests on; the second pass squares
        # the error away. Composite factor: W = Q·(B2·B1).
        Q1, B1, f1 = _cholqr(dp, W, scale)
        Q, B2, f2 = _cholqr(dp, Q1, jnp.ones((), dtype))
        B_j = B2 @ B1
        fail = jnp.logical_or(f1, f2)
        # non-finite guard: a blown-up recurrence must not poison T —
        # drop the step and stop with the previous (sane) state
        san = jnp.all(jnp.isfinite(A_j)) & jnp.all(jnp.isfinite(B_j))
        fail = jnp.logical_or(fail, jnp.logical_not(san))
        A_blocks = A_blocks.at[j].set(jnp.where(san, A_j, 0.0))
        B_blocks = B_blocks.at[j].set(jnp.where(san, B_j, 0.0))

        # check only where it can still change the outcome: the
        # hit-then-double confirmation needs the loop to reach 2·j_hit,
        # so a check at j+1 > k_max/2 can never confirm an early exit —
        # it would burn a full projected eigensolve (the expensive part:
        # ~150 ms of sequential Householder steps per check at p≈500,
        # measured ~1.2 s per strict boundary with the old every-2
        # schedule while the 21 block SpMM steps cost ~0.3 s) for no
        # possible saving. Final/breakdown checks always run.
        can_arm = 2 * (j + 1) <= k_max          # a new hit could confirm
        can_confirm = jnp.logical_and(          # a pending hit confirms now
            j_hit > 0, j + 1 >= 2 * j_hit
        )
        on_schedule = jnp.logical_and(
            j + 1 >= k_min, (j + 1 - k_min) % check_every == 0
        )
        do_check = jnp.logical_or(
            jnp.logical_or(
                jnp.logical_and(on_schedule, can_arm),
                jnp.logical_and(j + 1 >= k_min, can_confirm),
            ),
            jnp.logical_or(fail, j + 1 >= k_max),
        )
        k_chk = jnp.where(san, j + 1, j)  # skip a dropped garbage block

        def check(_):
            th, mg, ok = block_tridiag_min_eig_certified(
                A_blocks, B_blocks, k_chk
            )
            mg = jnp.where(ok, mg, BIGM)
            # keep the BEST (smallest-margin) certified state seen so
            # far: a later step numerically corrupted past the
            # breakdown detector can then never worsen the result
            better = mg < margin
            return jnp.where(better, th, theta), jnp.where(
                better, mg, margin)

        theta, margin = lax.cond(
            do_check, check, lambda _: (theta, margin), None
        )
        # hit-then-double confirmation: a small residual margin only
        # certifies the distance to the NEAREST eigenvalue the subspace
        # has seen — a λ_min whose eigenvector the degree-limited Krylov
        # space has not discovered yet is invisible to it (measured
        # failure: an r-limited factor seed + 4 steps claimed gap
        # 1.9e-3 where f64 eigsh said 9.4e-3). So the first step j* that
        # meets the target only ARMS the exit; the loop must run to
        # 2·j* with θ stable (drop < ¼ target) to actually stop, and
        # any further θ drop re-arms the doubling. Exploration cost is
        # paid exactly while discovery is still happening.
        hit = jnp.logical_and(
            do_check,
            jnp.logical_or(margin <= margin_target, theta - margin >= 0),
        )
        dropped = theta < theta_hit - 0.25 * margin_target
        rearm = jnp.logical_and(hit, jnp.logical_or(j_hit < 0, dropped))
        j_hit = jnp.where(rearm, j + 1, jnp.where(hit, j_hit, j_hit))
        theta_hit = jnp.where(rearm, theta, theta_hit)
        confirmed = jnp.logical_and(
            jnp.logical_and(hit, j_hit > 0),
            jnp.logical_and(jnp.logical_not(dropped),
                            j + 1 >= 2 * j_hit),
        )
        done = jnp.logical_or(fail, confirmed)
        return (j + 1, Q, V, B_j, hist, A_blocks, B_blocks, theta, margin,
                j_hit, theta_hit, done)

    def cond(carry):
        j = carry[0]
        done = carry[-1]
        return jnp.logical_and(j < k_max, jnp.logical_not(done))

    init = (
        jnp.zeros((), jnp.int32),
        V0,
        jnp.zeros_like(V0),
        jnp.zeros((b, b), dtype=dtype),
        jnp.zeros((k_max, n_loc, b), dtype=dtype),
        jnp.zeros((k_max, b, b), dtype=dtype),
        jnp.zeros((k_max, b, b), dtype=dtype),
        jnp.zeros((), dtype),
        BIGM,
        -jnp.ones((), jnp.int32),
        jnp.zeros((), dtype),
        jnp.zeros((), bool),
    )
    out = lax.while_loop(cond, body, init)
    j, _, _, _, _, A_blocks, B_blocks, theta, margin = out[:9]
    # guarantee a final check (the loop may exit on j == k_max between
    # check points)
    need = margin >= BIGM

    def final_check(_):
        th, mg, ok = block_tridiag_min_eig_certified(A_blocks, B_blocks, j)
        return th, jnp.where(ok, mg, BIGM)

    theta, margin = lax.cond(
        need, final_check, lambda _: (theta, margin), None
    )
    return theta, margin, j


block_lanczos_min_eig = functools.partial(
    jax.jit, static_argnames=("b", "k_max", "check_every")
)(block_lanczos_min_eig_impl)
