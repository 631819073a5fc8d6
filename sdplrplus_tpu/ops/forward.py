"""Forward constraint operator 𝒜: sample UUᵀ / (UVᵀ+VUᵀ)/2 at the aggregate
sparsity pattern, then reduce per constraint.

TPU-native re-design of the reference's forward kernels
(reference: src/coreop.jl:33-203). The reference loops over nnz positions
with SIMD row-dot products and then does one SpMV against the
``nzval_two`` matrix. Here:

  * the nnz sampling is a batched row-gather + row-dot on the VPU
    (rows of the n×r factor are ≥8-lane units, the fast gather regime
    on TPU — measured ~3 ns/index on v5e vs ~8 ns for 1-D gathers),
  * ⟨C, ·⟩ is a plain dot against the P-aligned ``c_val_two`` array,
  * constraint values are tiny (m, K) widened gathers from the sampled
    uv values — NO scatter / segment-sum anywhere (dynamic scatters run
    on the TPU scalar path and measured ~3× slower than this layout).

Low-rank operands are MXU contractions UᵀB (reference:
src/coreop.jl:115-151).

Output convention matches the reference: a length-(m+1) vector whose slot
``m`` carries ⟨C, ·⟩ (the objective) and slots 0..m-1 carry ⟨Aᵢ, ·⟩.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax import lax

from .device import DeviceProblem

_WIDE = 8  # lane width for widened 1-D lookup tables



def _hp_mm(a, b):
    """Full-f32 matmul for the tiny low-rank contractions: the default
    TPU f32 dot runs bf16 MXU passes, whose absolute noise (~n·2⁻⁸)
    destroys pure-cancellation constraint values like MinBisection's
    1ᵀX1 = 0 near feasibility (G5 diverged to NaN through this). The
    (n, s) shapes make HIGHEST precision free."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

def _full(dp: DeviceProblem, U: jax.Array) -> jax.Array:
    """Under shard_map, assemble the full factor from row shards (the
    column-support all-gather of SURVEY §5); identity otherwise."""
    if dp.spmd_axis is not None:
        return lax.all_gather(U, dp.spmd_axis, axis=0, tiled=True)
    return U


def _psum(x, dp: DeviceProblem):
    return lax.psum(x, dp.spmd_axis) if dp.spmd_axis is not None else x


def _widen(v: jax.Array) -> jax.Array:
    """(P,) -> (P, 8): puts a 1-D lookup table in the fast-gather regime."""
    return jnp.broadcast_to(v[:, None], (v.shape[0], _WIDE))


def _reduce(dp: DeviceProblem, uv: jax.Array) -> jax.Array:
    """uv values at the aggregate pattern -> (m+1,) constraint values.

    Under shard_map ``uv`` is the local nnz shard: the objective dot is a
    partial reduced by psum, and the constraint/wide lookups read the
    all-gathered uv (constraint index maps are replicated there)."""
    obj = _psum(jnp.dot(dp.c_val_two, uv), dp)
    if dp.wide_gids:  # wide constraints: dense P-aligned rows (e.g. trace)
        # wide_val_two is nnz-sharded like uv: partial dot + psum
        wide_vals = _psum(dp.wide_val_two @ uv, dp)
    if dp.spmd_axis is not None:
        uv = lax.all_gather(uv, dp.spmd_axis, axis=0, tiled=True)
    uv_w = _widen(uv)
    g = jnp.take(uv_w, dp.con_pos.reshape(-1), axis=0)[:, 0]
    cons = jnp.sum(dp.con_val_two * g.reshape(dp.m, dp.con_width), axis=1)
    vals = jnp.concatenate([cons, obj[None]])
    if dp.wide_gids:
        vals = vals.at[jnp.asarray(dp.wide_gids)].set(wide_vals)
    return vals


def _dense_cons(dp: DeviceProblem, rowvals: jax.Array) -> jax.Array:
    """Dense-mode constraint values from per-row diagonal samples:
    cons_k = Σⱼ con_val_two[k,j] · rowvals[con_rows[k,j]] (every entry of
    every sparse constraint is diagonal in dense mode, so the sampled
    uv value at position (i,i) is just rowvals[i])."""
    if dp.spmd_axis is not None:
        rowvals = lax.all_gather(rowvals, dp.spmd_axis, axis=0, tiled=True)
    g = jnp.take(_widen(rowvals), dp.con_rows.reshape(-1), axis=0)[:, 0]
    return jnp.sum(dp.con_val_two * g.reshape(dp.m, dp.con_width), axis=1)


def uv_values_uu(dp: DeviceProblem, U: jax.Array) -> jax.Array:
    """(UUᵀ) sampled at the aggregate triu pattern -> (P_pad,)."""
    U = _full(dp, U)
    Ur = jnp.take(U, dp.agg_rows, axis=0)
    Uc = jnp.take(U, dp.agg_cols, axis=0)
    return jnp.sum(Ur * Uc, axis=1)


def uv_values_uv(dp: DeviceProblem, U: jax.Array, V: jax.Array) -> jax.Array:
    """((UVᵀ+VUᵀ)/2) sampled at the aggregate triu pattern -> (P_pad,)."""
    UV = _full(dp, jnp.concatenate([U, V], axis=1))
    UVr = jnp.take(UV, dp.agg_rows, axis=0)
    UVc = jnp.take(UV, dp.agg_cols, axis=0)
    r = U.shape[1]
    Ur, Vr = UVr[:, :r], UVr[:, r:]
    Uc, Vc = UVc[:, :r], UVc[:, r:]
    return 0.5 * (jnp.sum(Ur * Vc, axis=1) + jnp.sum(Vr * Uc, axis=1))


def cons_from_rowvals(dp: DeviceProblem, rowvals: jax.Array) -> jax.Array:
    """(m,) constraint values for the all-diagonal fast path from the
    per-row diagonal samples rowvals[i] = (UVᵀ)_ii: narrow constraints via
    the widened con_rows gather, wide diagonal constraints (e.g.
    μ-conductance's volume constraint) via the dense wide_diag_w matvec.
    ``rowvals`` is device-local under shard_map."""
    cons = _dense_cons(dp, rowvals)
    if dp.wide_gids:
        wide = _psum(dp.wide_diag_w @ rowvals, dp)
        cons = cons.at[jnp.asarray(dp.wide_gids)].set(wide)
    return cons


def _fast_vals(dp: DeviceProblem, rowvals: jax.Array, obj: jax.Array) -> jax.Array:
    return jnp.concatenate([cons_from_rowvals(dp, rowvals), obj[None]])


def A_uu_cx(dp: DeviceProblem, U: jax.Array, CX: jax.Array) -> jax.Array:
    """𝒜(UUᵀ) on the fast-diagonal path, with the sparse-C product
    CX = C_sparse @ U precomputed (ops/spmm.spmm_C): the objective is
    ⟨U, CX⟩ (+ low-rank C terms), constraints reduce over row dots —
    zero pattern gathers beyond the one SpMM (reference math:
    src/coreop.jl:36-49)."""
    obj = _psum(jnp.vdot(U, CX), dp)
    vals = _fast_vals(dp, jnp.sum(U * U, axis=1), obj)
    for t in dp.lowrank:
        UtB = _psum(_hp_mm(U.T, t.B), dp)
        vals = vals.at[t.gid].add(jnp.sum(t.d * jnp.sum(UtB * UtB, axis=0)))
    return vals


def A_linesearch_cd(dp: DeviceProblem, R: jax.Array, D: jax.Array,
                    CD: jax.Array):
    """Fast-diagonal line-search products from the ONE SpMM of the
    iteration, CD = C_sparse @ D:

        A_RD = 𝒜(RDᵀ + DRᵀ)   (objective slot 2⟨R, CD⟩)
        A_DD = 𝒜(DDᵀ)          (objective slot ⟨D, CD⟩)

    Everything else is row dots and tiny low-rank MXU contractions — the
    gradient then reuses CD through the carried C@R recurrence
    (solver/inner.py), so one gather pass serves the whole iteration."""
    obj_RD = 2.0 * _psum(jnp.vdot(R, CD), dp)
    obj_DD = _psum(jnp.vdot(D, CD), dp)
    A_RD = _fast_vals(dp, 2.0 * jnp.sum(R * D, axis=1), obj_RD)
    A_DD = _fast_vals(dp, jnp.sum(D * D, axis=1), obj_DD)
    for t in dp.lowrank:
        rb = _psum(_hp_mm(R.T, t.B), dp)
        db = _psum(_hp_mm(D.T, t.B), dp)
        A_RD = A_RD.at[t.gid].add(2.0 * jnp.sum(t.d * jnp.sum(rb * db, axis=0)))
        A_DD = A_DD.at[t.gid].add(jnp.sum(t.d * jnp.sum(db * db, axis=0)))
    return A_RD, A_DD


def A_uu(dp: DeviceProblem, U: jax.Array) -> jax.Array:
    """𝒜(UUᵀ) -> (m+1,), slot m = ⟨C, UUᵀ⟩ (reference: src/coreop.jl:36-49)."""
    if getattr(dp, "fn_A_uu", None) is not None:  # external-model adapter
        return dp.fn_A_uu(U)
    if dp.C_dense is not None:  # dense MXU mode: ⟨C,UUᵀ⟩ = ⟨U, CU⟩
        U_full = _full(dp, U)
        CU = dp.C_dense @ U_full  # local rows under shard_map
        obj = _psum(jnp.vdot(U, CU), dp)
        vals = jnp.concatenate(
            [_dense_cons(dp, jnp.sum(U * U, axis=1)), obj[None]]
        )
    else:
        vals = _reduce(dp, uv_values_uu(dp, U))
    for t in dp.lowrank:
        UtB = _psum(_hp_mm(U.T, t.B), dp)  # (r, s), MXU (+psum over row shards)
        vals = vals.at[t.gid].add(jnp.sum(t.d * jnp.sum(UtB * UtB, axis=0)))
    return vals


def A_uv(dp: DeviceProblem, U: jax.Array, V: jax.Array) -> jax.Array:
    """𝒜((UVᵀ+VUᵀ)/2) -> (m+1,) (reference: src/coreop.jl:54-70)."""
    if getattr(dp, "fn_A_uv", None) is not None:  # external-model adapter
        return dp.fn_A_uv(U, V)
    if dp.C_dense is not None:  # ⟨C,(UVᵀ+VUᵀ)/2⟩ = ⟨U, CV⟩ (C symmetric)
        V_full = _full(dp, V)
        CV = dp.C_dense @ V_full
        obj = _psum(jnp.vdot(U, CV), dp)
        vals = jnp.concatenate(
            [_dense_cons(dp, jnp.sum(U * V, axis=1)), obj[None]]
        )
    else:
        vals = _reduce(dp, uv_values_uv(dp, U, V))
    for t in dp.lowrank:
        UtB = _psum(_hp_mm(U.T, t.B), dp)
        VtB = _psum(_hp_mm(V.T, t.B), dp)
        vals = vals.at[t.gid].add(jnp.sum(t.d * jnp.sum(UtB * VtB, axis=0)))
    return vals


def A_linesearch(dp: DeviceProblem, R: jax.Array, D: jax.Array):
    """Fused line-search products: (A_RD, A_DD) where
    A_RD = 𝒜(RDᵀ + DRᵀ) (the ×2-scaled quantity the line searches use,
    reference: src/linesearch.jl:10-15) and A_DD = 𝒜(DDᵀ).

    One concatenated [R|D] gather pair serves both products — 2 row
    gathers instead of the 6 a naive A_uv + A_uu would issue.
    """
    if getattr(dp, "fn_A_uv", None) is not None:  # external-model adapter
        return 2.0 * dp.fn_A_uv(R, D), dp.fn_A_uu(D)
    if dp.C_dense is not None:
        # ONE matmul CD serves both objective slots:
        #   A_RD obj = 2⟨R, CD⟩,  A_DD obj = ⟨D, CD⟩
        CD = dp.C_dense @ _full(dp, D)
        obj_RD = 2.0 * _psum(jnp.vdot(R, CD), dp)
        obj_DD = _psum(jnp.vdot(D, CD), dp)
        A_RD = jnp.concatenate(
            [_dense_cons(dp, 2.0 * jnp.sum(R * D, axis=1)), obj_RD[None]]
        )
        A_DD = jnp.concatenate(
            [_dense_cons(dp, jnp.sum(D * D, axis=1)), obj_DD[None]]
        )
        for t in dp.lowrank:
            rb = _psum(_hp_mm(R.T, t.B), dp)
            db = _psum(_hp_mm(D.T, t.B), dp)
            A_RD = A_RD.at[t.gid].add(2.0 * jnp.sum(t.d * jnp.sum(rb * db, axis=0)))
            A_DD = A_DD.at[t.gid].add(jnp.sum(t.d * jnp.sum(db * db, axis=0)))
        return A_RD, A_DD
    r = R.shape[1]
    RD = _full(dp, jnp.concatenate([R, D], axis=1))  # (n_pad, 2r)
    Gr = jnp.take(RD, dp.agg_rows, axis=0)
    Gc = jnp.take(RD, dp.agg_cols, axis=0)
    Rr, Dr = Gr[:, :r], Gr[:, r:]
    Rc, Dc = Gc[:, :r], Gc[:, r:]
    uv_RD = jnp.sum(Rr * Dc + Dr * Rc, axis=1)      # 𝒜(RDᵀ+DRᵀ) samples
    uv_DD = jnp.sum(Dr * Dc, axis=1)

    A_RD = _reduce(dp, uv_RD)
    A_DD = _reduce(dp, uv_DD)
    if dp.lowrank:
        RtB = {id(t): _psum(_hp_mm(R.T, t.B), dp) for t in dp.lowrank}
        DtB = {id(t): _psum(_hp_mm(D.T, t.B), dp) for t in dp.lowrank}
        for t in dp.lowrank:
            rb, db = RtB[id(t)], DtB[id(t)]
            A_RD = A_RD.at[t.gid].add(2.0 * jnp.sum(t.d * jnp.sum(rb * db, axis=0)))
            A_DD = A_DD.at[t.gid].add(jnp.sum(t.d * jnp.sum(db * db, axis=0)))
    return A_RD, A_DD
