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


def lbfgs_init(k: int, n_pad: int, r: int, dtype) -> LBFGSState:
    k = max(k, 0)
    return LBFGSState(
        s_hist=jnp.zeros((max(k, 1), n_pad, r), dtype=dtype),
        y_hist=jnp.zeros((max(k, 1), n_pad, r), dtype=dtype),
        rho=jnp.zeros((max(k, 1),), dtype=dtype),
        head=jnp.zeros((), dtype=jnp.int32),
    )


def lbfgs_clear(state: LBFGSState) -> LBFGSState:
    return LBFGSState(
        s_hist=jnp.zeros_like(state.s_hist),
        y_hist=jnp.zeros_like(state.y_hist),
        rho=jnp.zeros_like(state.rho),
        head=jnp.zeros_like(state.head),
    )


def lbfgs_direction(
    state: LBFGSState, G: jax.Array, k: int, spmd_axis=None
) -> jax.Array:
    """Two-loop recursion; returns the *negated* direction -H·G
    (reference: src/lbfgs.jl:77-124 with negate=true). Under shard_map
    the history is row-sharded and every dot psums (SURVEY §5)."""
    if k == 0:
        return -G

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


def lbfgs_push(
    state: LBFGSState, alpha, direction, G_old, G_new, k: int, spmd_axis=None
) -> LBFGSState:
    """Insert s = α·D, y = G_new - G_old, ρ = 1/⟨y, s⟩ at the next ring slot
    (reference: src/lbfgs.jl:120-124,129-148, restructured functionally —
    the reference splits this across lbfgs_dir!'s partial update and
    lbfgs_update!; the resulting (s, y, ρ) are identical)."""
    if k == 0:
        return state
    j = jnp.mod(state.head + 1, k)
    s = alpha * direction
    y = G_new - G_old
    ys = jnp.vdot(y, s)
    if spmd_axis is not None:
        ys = lax.psum(ys, spmd_axis)
    rho_j = 1.0 / ys
    return LBFGSState(
        s_hist=state.s_hist.at[j].set(s),
        y_hist=state.y_hist.at[j].set(y),
        rho=state.rho.at[j].set(rho_j),
        head=j.astype(state.head.dtype),
    )
