"""L-BFGS over matrix iterates as fixed-shape ring buffers.

TPU-native re-design of the reference's L-BFGS (reference:
src/lbfgs.jl:1-149). The reference keeps k (s, y, ρ) matrix pairs in a
cyclic array and runs the two-loop recursion with BLAS-1 ops; here the
history is a stacked (k, n, r) pair of arrays with a ring head index, and
the two-loop recursion is a pair of lax.fori_loops — the whole direction
computation stays inside the jitted inner loop.

Empty slots carry ρ = 0, which makes their two-loop contributions exact
no-ops — the same invariant the reference relies on after lbfgs_clear!
(src/lbfgs.jl:52-59). No H₀ scaling step, matching the reference
(src/lbfgs.jl:70).

Two implementations of the SAME operator H·g (algebraically identical,
selected by ``SolverConfig.lbfgs_impl``):

  * ``two_loop`` — the classic recursion, 2k sequential dot+axpy pairs.
  * ``compact`` (default) — the Byrd–Nocedal–Schnabel compact
    representation (Nocedal & Wright, Numerical Optimization, Thm 7.4
    with γ = 1):

        H = I + [S Y] · [[R⁻ᵀ(D + YᵀY)R⁻¹, -R⁻ᵀ], [-R⁻¹, 0]] · [Sᵀ; Yᵀ]

    where R = upper-triangular part of SᵀY (in oldest→newest order) and
    D = diag(SᵀY). The small Gram matrices SᵀY and YᵀY are maintained
    incrementally on push (one batched (2k, n·r)@(n·r, 2) matvec), and a
    direction costs just TWO large ops — W@g and Wᵀ·(small) with
    W = [S; Y] — plus k×k triangular solves. On TPU this turns ~4k
    sequential latency-bound VPU dots into 3 MXU matmuls per iteration;
    empty ring slots keep zero rows/columns and a unit R diagonal, so
    their contributions vanish exactly like ρ = 0 does in the two-loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LBFGSState(NamedTuple):
    s_hist: jax.Array  # (k, n_pad, r)
    y_hist: jax.Array  # (k, n_pad, r)
    rho: jax.Array     # (k,)
    head: jax.Array    # int32 scalar: index of the most recent pair
    sty: jax.Array     # (k, k) SᵀY Gram matrix (compact impl; zeros else)
    yty: jax.Array     # (k, k) YᵀY Gram matrix (compact impl; zeros else)


def lbfgs_init(k: int, n_pad: int, r: int, dtype) -> LBFGSState:
    k = max(k, 0)
    kk = max(k, 1)
    return LBFGSState(
        s_hist=jnp.zeros((kk, n_pad, r), dtype=dtype),
        y_hist=jnp.zeros((kk, n_pad, r), dtype=dtype),
        rho=jnp.zeros((kk,), dtype=dtype),
        head=jnp.zeros((), dtype=jnp.int32),
        sty=jnp.zeros((kk, kk), dtype=dtype),
        yty=jnp.zeros((kk, kk), dtype=dtype),
    )


def lbfgs_clear(state: LBFGSState) -> LBFGSState:
    return jax.tree_util.tree_map(jnp.zeros_like, state)


def lbfgs_direction(
    state: LBFGSState, G: jax.Array, k: int, spmd_axis=None,
    compact: bool = True,
) -> jax.Array:
    """Returns the *negated* direction -H·G (reference: src/lbfgs.jl:77-124
    with negate=true). ``compact`` selects the Byrd–Nocedal representation
    (see module docstring); False falls back to the classic two-loop.
    Under shard_map the history is row-sharded and every dot psums
    (SURVEY §5)."""
    if k == 0:
        return -G
    if compact:
        return _direction_compact(state, G, k, spmd_axis)

    def dot(a, b):
        d = jnp.vdot(a, b)
        return lax.psum(d, spmd_axis) if spmd_axis is not None else d

    def bwd(i, carry):
        q, a_vals = carry
        j = jnp.mod(state.head - i, k)
        a = state.rho[j] * dot(state.s_hist[j], q)
        q = q - a * state.y_hist[j]
        return q, a_vals.at[j].set(a)

    a0 = jnp.zeros((k,), dtype=G.dtype)
    q, a_vals = lax.fori_loop(0, k, bwd, (G, a0))

    def fwd(i, q):
        j = jnp.mod(state.head + 1 + i, k)
        b = state.rho[j] * dot(state.y_hist[j], q)
        q = q + (a_vals[j] - b) * state.s_hist[j]
        return q

    q = lax.fori_loop(0, k, fwd, q)
    return -q


def _direction_compact(
    state: LBFGSState, G: jax.Array, k: int, spmd_axis=None
) -> jax.Array:
    """-H·G via the compact representation: two (2k, n·r) MXU contractions
    plus k×k triangular solves on the incrementally-maintained Gram
    matrices. Exactly the two-loop operator (same (s, y) pairs, H₀ = I)."""
    from jax.scipy.linalg import solve_triangular

    g = G.reshape(-1)
    S2 = state.s_hist.reshape(k, -1)
    Y2 = state.y_hist.reshape(k, -1)
    W = jnp.concatenate([S2, Y2], axis=0)          # (2k, nr)
    p = W @ g
    if spmd_axis is not None:
        p = lax.psum(p, spmd_axis)
    Sg, Yg = p[:k], p[k:]

    # ring age: rank 0 = oldest ... k-1 = newest (matching the fwd-loop
    # order of the two-loop recursion)
    idx = jnp.arange(k)
    rank = jnp.mod(idx - state.head - 1, k)
    perm = jnp.argsort(rank)                        # oldest -> newest
    empty = state.rho == 0.0                        # never-filled slots

    mask2 = jnp.logical_or(empty[:, None], empty[None, :])
    sty = jnp.where(mask2, 0.0, state.sty)
    yty = jnp.where(mask2, 0.0, state.yty)
    Rp = jnp.triu(sty[perm][:, perm])               # upper-tri SᵀY, age order
    Rp = Rp + jnp.diag(jnp.where(empty[perm], 1.0, 0.0).astype(Rp.dtype))
    Dp = jnp.diag(sty)[perm]
    YtYp = yty[perm][:, perm]
    Sg_p, Yg_p = Sg[perm], Yg[perm]

    u = solve_triangular(Rp, Sg_p, lower=False)     # R⁻¹ Sᵀg
    v = Dp * u + YtYp @ u - Yg_p
    w1 = solve_triangular(Rp.T, v, lower=True)      # R⁻ᵀ (...)
    w = jnp.zeros((2 * k,), dtype=g.dtype)
    w = w.at[perm].set(w1).at[k + perm].set(-u)
    Hg = g + W.T @ w
    return -Hg.reshape(G.shape)


def lbfgs_push(
    state: LBFGSState, alpha, direction, G_old, G_new, k: int, spmd_axis=None
) -> LBFGSState:
    """Insert s = α·D, y = G_new - G_old, ρ = 1/⟨y, s⟩ at the next ring slot
    (reference: src/lbfgs.jl:120-124,129-148, restructured functionally —
    the reference splits this across lbfgs_dir!'s partial update and
    lbfgs_update!; the resulting (s, y, ρ) are identical). Also refreshes
    row/column ``j`` of the SᵀY / YᵀY Gram matrices for the compact
    direction — one batched (2k, n·r)@(n·r, 2) contraction."""
    if k == 0:
        return state
    j = jnp.mod(state.head + 1, k)
    s = alpha * direction
    y = G_new - G_old
    sv, yv = s.reshape(-1), y.reshape(-1)

    S2 = state.s_hist.reshape(k, -1)
    Y2 = state.y_hist.reshape(k, -1)
    W = jnp.concatenate([S2, Y2], axis=0)           # (2k, nr) OLD history
    sy = jnp.stack([sv, yv], axis=1)                # (nr, 2)
    P = W @ sy                                      # (2k, 2)
    M = sy.T @ sy                                   # [[sᵀs, sᵀy], [yᵀs, yᵀy]]
    if spmd_axis is not None:
        P = lax.psum(P, spmd_axis)
        M = lax.psum(M, spmd_axis)
    ys = M[0, 1]
    rho_j = 1.0 / ys

    # SᵀY: row j = s_newᵀ·Y_old, col j = S_oldᵀ·y_new, [j,j] = s_newᵀy_new
    sty = state.sty.at[j, :].set(P[k:, 0]).at[:, j].set(P[:k, 1])
    sty = sty.at[j, j].set(ys)
    yty = state.yty.at[j, :].set(P[k:, 1]).at[:, j].set(P[k:, 1])
    yty = yty.at[j, j].set(M[1, 1])

    return LBFGSState(
        s_hist=state.s_hist.at[j].set(s),
        y_hist=state.y_hist.at[j].set(y),
        rho=state.rho.at[j].set(rho_j),
        head=j.astype(state.head.dtype),
        sty=sty,
        yty=yty,
    )
