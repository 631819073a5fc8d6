"""Adjoint operator 𝒜ᵀ: assemble S = Σᵢ yᵢ Aᵢ + y_m C, apply S to a dense
factor (the SpMM G = S @ R and the Lanczos matvec S @ v).

TPU-native re-design of the reference's adjoint path
(reference: src/coreop.jl:205-300). The reference does an SpMV
(nzval_one matrix × y) into the triu nnz array, scatters to the full
symmetric pattern via a position map, then a sparse×dense SpMM through
MKLSparse. Here:

  * S assembly = segment-sum of ``val_one * y[con_id]`` keyed by aggregate
    triu position (one scatter-add),
  * the SpMM reads S values through the triu indices baked into an
    ELL(+COO tail) layout of the full symmetric pattern, a gather +
    weighted row-sum that XLA fuses; the Pallas hot-path kernel shares
    this exact layout (see ops/pallas_spmm.py).

Low-rank operands contribute rank-s MXU updates y_g · B(d ⊙ (BᵀX))
(reference: src/coreop.jl:271-299).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device import DeviceProblem


def assemble_s_tri(dp: DeviceProblem, y_full: jax.Array) -> jax.Array:
    """Values of S at the aggregate triu pattern -> (P_pad,).

    ``y_full`` is the length-(m+1) weight vector (slot m multiplies C).
    Padding slots receive no contributions and are exactly zero; ELL/tail
    padding entries point at the last (guaranteed-zero) slot.
    (reference: src/coreop.jl:205-258)
    """
    contrib = dp.ent_val_one * jnp.take(y_full, dp.ent_con_id)
    return jax.ops.segment_sum(contrib, dp.ent_agg_idx, num_segments=dp.P_pad)


def apply_S(
    dp: DeviceProblem,
    s_tri: jax.Array,
    y_full: jax.Array,
    X: jax.Array,
) -> jax.Array:
    """S @ X for X of shape (n_pad, r). S is symmetric, so this also serves
    the reference's left-multiply overload Xᵀ·S (reference: src/coreop.jl:260-300).
    """
    s_ell = jnp.take(s_tri, dp.ell_tri)          # (n_pad, W)
    Xg = jnp.take(X, dp.ell_cols, axis=0)        # (n_pad, W, r)
    out = jnp.einsum("nw,nwr->nr", s_ell, Xg)
    if dp.has_tail:
        tv = jnp.take(s_tri, dp.tail_tri)        # (T,)
        contrib = tv[:, None] * jnp.take(X, dp.tail_cols, axis=0)
        out = out + jax.ops.segment_sum(contrib, dp.tail_rows, num_segments=dp.n_pad)
    for t in dp.lowrank:
        BtX = t.B.T @ X                           # (s, r), MXU
        out = out + y_full[t.gid] * (t.B @ (t.d[:, None] * BtX))
    return out


def gradient(
    dp: DeviceProblem,
    R: jax.Array,
    lam: jax.Array,
    sigma: jax.Array,
    vio_raw: jax.Array,
):
    """Gradient of the augmented Lagrangian: G = 2·S·R with
    y = [-min(λ_ub, λ - σ v); 1] (reference: src/coreop.jl:229-236,302-317).

    Returns (G, y_full, s_tri); y_full/s_tri are reused by the Armijo
    slope and the dual bound.
    """
    m = dp.m
    y_head = -jnp.minimum(dp.lam_ub, lam - sigma * vio_raw[:m])
    y_full = jnp.concatenate([y_head, jnp.ones((1,), dtype=R.dtype)])
    s_tri = assemble_s_tri(dp, y_full)
    G = 2.0 * apply_S(dp, s_tri, y_full, R)
    return G, y_full, s_tri
