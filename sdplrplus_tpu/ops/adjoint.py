"""Adjoint operator 𝒜ᵀ: assemble S = Σᵢ yᵢ Aᵢ + y_m C, apply S to a dense
factor (the SpMM G = S @ R and the Lanczos matvec S @ v).

TPU-native re-design of the reference's adjoint path
(reference: src/coreop.jl:205-300). The reference does an SpMV
(nzval_one matrix × y) into the triu nnz array, scatters to the full
symmetric pattern via a position map, then a sparse×dense SpMM through
MKLSparse. Here:

  * S assembly is SCATTER-FREE: the position->constraint map was inverted
    at compile time (compile.py pos_cid/pos_val), so each aggregate
    position gathers its few constraint weights from y — widened row
    gathers, the fast path on TPU (~3 ns/index on v5e vs ~8 ns for the
    scalar-path scatter a segment-sum would lower to),
  * the SpMM reads S values through the triu indices baked into an
    two-tier ELL layout of the full symmetric pattern, a gather +
    weighted row-sum that XLA fuses.

Low-rank operands contribute rank-s MXU updates y_g · B(d ⊙ (BᵀX))
(reference: src/coreop.jl:271-299).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax import lax

from .device import DeviceProblem
from .forward import _full, _hp_mm, _psum


_WIDE = 8  # lane width for widened 1-D lookup tables


def _widen(v: jax.Array) -> jax.Array:
    return jnp.broadcast_to(v[:, None], (v.shape[0], _WIDE))


def diag_weights(dp: DeviceProblem, y_full: jax.Array) -> jax.Array:
    """Diagonal contribution of the sparse constraints to S:
    d[i] = Σⱼ diag_w[i,j]·y[diag_cid[i,j]] — an (n_loc, Jd) widened gather.
    Padding slots point at cid m with weight 0."""
    y_w = _widen(y_full)
    n_loc = dp.diag_cid.shape[0]
    g = jnp.take(y_w, dp.diag_cid.reshape(-1), axis=0)[:, 0]
    g = g.reshape(n_loc, dp.diag_width)
    return jnp.sum(dp.diag_w * g, axis=1)


def assemble_s_tri(dp: DeviceProblem, y_full: jax.Array) -> jax.Array:
    """Values of S at the aggregate triu pattern -> (P_pad,).

    ``y_full`` is the length-(m+1) weight vector (slot m multiplies C).
    s_tri[p] = c_val_one[p]·y[m] + Σⱼ pos_val[p,j]·y[pos_cid[p,j]].
    Padding slots carry zero weights and are exactly zero; ELL/tier-2
    padding entries point at the last (guaranteed-zero) slot.
    (reference: src/coreop.jl:205-258)
    """
    y_w = _widen(y_full)
    g = jnp.take(y_w, dp.pos_cid.reshape(-1), axis=0)[:, 0]
    g = g.reshape(dp.P_pad, dp.pos_width)
    return dp.c_val_one * y_full[dp.m] + jnp.sum(dp.pos_val * g, axis=1)


def apply_S(
    dp: DeviceProblem,
    s_tri: jax.Array,
    y_full: jax.Array,
    X: jax.Array,
) -> jax.Array:
    """S @ X for X of shape (n_pad, r). S is symmetric, so this also serves
    the reference's left-multiply overload Xᵀ·S (reference: src/coreop.jl:260-300).

    Fast path (all sparse-constraint entries diagonal — maxcut, cutnorm,
    minbisection, μ-conductance): S = C_static + diag(w·y) + lowrank, so
    no dynamic S values are materialized at all; the ELL multiply uses
    compile-time C values. General path: s_tri lookups through ell_tri.
    """
    if getattr(dp, "fn_apply_S", None) is not None:  # external-model adapter
        return dp.fn_apply_S(y_full, X)
    if dp.C_dense is not None:
        # dense MXU mode (implies all_cons_diagonal):
        # S@X = y_m·(C_dense@X) + diag(w·y)⊙X + lowrank — one matmul
        out = y_full[dp.m] * (dp.C_dense @ _full(dp, X))
        out = out + diag_weights(dp, y_full)[:, None] * X
        for t in dp.lowrank:
            BtX = _psum(_hp_mm(t.B.T, X), dp)
            out = out + y_full[t.gid] * _hp_mm(t.B, t.d[:, None] * BtX)
        return out
    from .spmm import (
        spmm_contract, spmm_gather, spmm_tier2, support, tier2_offset,
    )

    n_loc, W = dp.ell_cols.shape
    X_full = support(dp, X)
    Xg = spmm_gather(X_full, dp.ell_cols)
    if dp.all_cons_diagonal:
        out = y_full[dp.m] * spmm_contract(dp.cell_val, Xg)
        out = out + diag_weights(dp, y_full)[:, None] * X
        if dp.has_ell2:
            out = out + y_full[dp.m] * spmm_tier2(
                jnp.zeros_like(out), X_full,
                dp.ell2_rows, dp.ell2_cols, dp.cell2_val, tier2_offset(dp),
            )
    else:
        s_w = _widen(s_tri)
        s_ell = jnp.take(s_w, dp.ell_tri.reshape(-1), axis=0)[:, 0].reshape(n_loc, W)
        out = spmm_contract(s_ell, Xg)
        if dp.has_ell2:
            R2, W2 = dp.ell2_tri.shape
            s2 = jnp.take(s_w, dp.ell2_tri.reshape(-1), axis=0)[:, 0].reshape(R2, W2)
            out = spmm_tier2(out, X_full, dp.ell2_rows, dp.ell2_cols, s2,
                             tier2_offset(dp))
    for t in dp.lowrank:
        BtX = _psum(_hp_mm(t.B.T, X), dp)                # (s, r), MXU (+psum)
        out = out + y_full[t.gid] * _hp_mm(t.B, t.d[:, None] * BtX)
    return out


def apply_S_cx(dp: DeviceProblem, y_full: jax.Array, X: jax.Array,
               CX: jax.Array) -> jax.Array:
    """S @ X on the fast-diagonal path with CX = C_sparse @ X precomputed:
    S@X = y_m·CX + diag(w·y)⊙X + low-rank — ZERO gathers (the carried
    recurrence CX += α·CD supplies CX, see solver/inner.py)."""
    out = y_full[dp.m] * CX + diag_weights(dp, y_full)[:, None] * X
    for t in dp.lowrank:
        BtX = _psum(_hp_mm(t.B.T, X), dp)
        out = out + y_full[t.gid] * _hp_mm(t.B, t.d[:, None] * BtX)
    return out


def gradient_cx(dp: DeviceProblem, R: jax.Array, CX: jax.Array,
                lam: jax.Array, sigma, vio_raw: jax.Array):
    """Gradient on the fast-diagonal path: G = 2·S·R derived from the
    carried CX = C_sparse @ R with no pattern gathers at all
    (reference math: src/coreop.jl:229-236,302-317)."""
    m = dp.m
    y_head = -jnp.minimum(dp.lam_ub, lam - sigma * vio_raw[:m])
    y_full = jnp.concatenate([y_head, jnp.ones((1,), dtype=R.dtype)])
    G = 2.0 * apply_S_cx(dp, y_full, R, CX)
    return G, y_full


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
    if getattr(dp, "fn_apply_S", None) is not None or dp.all_cons_diagonal:
        s_tri = jnp.zeros((1,), dtype=R.dtype)  # unused on the fast path
    else:
        s_tri = assemble_s_tri(dp, y_full)
    G = 2.0 * apply_S(dp, s_tri, y_full, R)
    return G, y_full, s_tri
