"""Forward constraint operator 𝒜: sample UUᵀ / (UVᵀ+VUᵀ)/2 at the aggregate
sparsity pattern, then segment-reduce per constraint.

TPU-native re-design of the reference's forward kernels
(reference: src/coreop.jl:33-203). The reference loops over nnz positions
with SIMD row-dot products and then does one SpMV against the
``nzval_two`` matrix; here the same math is a batched gather + row-dot
(VPU) followed by a segment-sum keyed by constraint id (XLA scatter-add
over contiguous, sorted segments). Low-rank operands are MXU contractions
UᵀB (reference: src/coreop.jl:115-151).

Output convention matches the reference: a length-(m+1) vector whose slot
``m`` carries ⟨C, ·⟩ (the objective) and slots 0..m-1 carry ⟨Aᵢ, ·⟩.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device import DeviceProblem


def uv_values_uu(dp: DeviceProblem, U: jax.Array) -> jax.Array:
    """(UUᵀ) sampled at the aggregate triu pattern -> (P_pad,)."""
    Ur = jnp.take(U, dp.agg_rows, axis=0)
    Uc = jnp.take(U, dp.agg_cols, axis=0)
    return jnp.sum(Ur * Uc, axis=1)


def uv_values_uv(dp: DeviceProblem, U: jax.Array, V: jax.Array) -> jax.Array:
    """((UVᵀ+VUᵀ)/2) sampled at the aggregate triu pattern -> (P_pad,)."""
    Ur = jnp.take(U, dp.agg_rows, axis=0)
    Uc = jnp.take(U, dp.agg_cols, axis=0)
    Vr = jnp.take(V, dp.agg_rows, axis=0)
    Vc = jnp.take(V, dp.agg_cols, axis=0)
    return 0.5 * (jnp.sum(Ur * Vc, axis=1) + jnp.sum(Vr * Uc, axis=1))


def _segment_reduce(dp: DeviceProblem, uv: jax.Array) -> jax.Array:
    contrib = dp.ent_val_two * jnp.take(uv, dp.ent_agg_idx)
    return jax.ops.segment_sum(contrib, dp.ent_con_id, num_segments=dp.m + 1)


def A_uu(dp: DeviceProblem, U: jax.Array) -> jax.Array:
    """𝒜(UUᵀ) -> (m+1,), slot m = ⟨C, UUᵀ⟩ (reference: src/coreop.jl:36-49)."""
    vals = _segment_reduce(dp, uv_values_uu(dp, U))
    for t in dp.lowrank:
        UtB = U.T @ t.B  # (r, s), MXU
        vals = vals.at[t.gid].add(jnp.sum(t.d * jnp.sum(UtB * UtB, axis=0)))
    return vals


def A_uv(dp: DeviceProblem, U: jax.Array, V: jax.Array) -> jax.Array:
    """𝒜((UVᵀ+VUᵀ)/2) -> (m+1,) (reference: src/coreop.jl:54-70)."""
    vals = _segment_reduce(dp, uv_values_uv(dp, U, V))
    for t in dp.lowrank:
        UtB = U.T @ t.B
        VtB = V.T @ t.B
        vals = vals.at[t.gid].add(jnp.sum(t.d * jnp.sum(UtB * VtB, axis=0)))
    return vals
