"""Entrywise dense-mask kernels: the inner-loop math for single-entry
constraint families (e.g. Lovász-θ) as MXU matmuls + masked reductions.

Motivation (measured on v5e, see docs/DESIGN.md): the general gather
path samples UUᵀ at the aggregate nnz pattern and reduces per
constraint — every hot op runs at the hardware gather rate (~3 ns/index),
two orders of magnitude below the MXU. When every narrow constraint
touches exactly ONE upper-triangular position (Lovász-θ's edge
constraints X_ij = 0, reference: test/problem.jl:43-65), the per-
constraint vectors can be laid out as dense masked (n_pad, n_pad)
matrices instead:

  * constraint violations  v_e  ->  v_ew[i,j] = v_e at the entry's two
    symmetric positions (0 elsewhere),
  * duals                  λ_e  ->  Λ_ew likewise,
  * the S assembly Σ yᵢAᵢ becomes the ELEMENTWISE product
    ew_v1 ∘ (σ·v_ew − Λ_ew) — no gathers, no index maps,
  * line-search products 𝒜(RDᵀ+DRᵀ) / 𝒜(DDᵀ) become ew_c2 ∘ (RDᵀ+DRᵀ)
    and ew_c2 ∘ DDᵀ — two n²r MXU matmuls,
  * every quartic-coefficient dot over constraints Σₑ aₑbₑ becomes the
    masked reduction Σ H ∘ a_ew ∘ b_ew with H = ½ off-diagonal / 1
    diagonal (each off-diagonal constraint appears at both symmetric
    positions).

Wide diagonal constraints (Lovász-θ's trace, reference:
test/problem.jl:60-62) and low-rank constraints stay as a tiny "extra"
slot vector whose forward values are row-sum reductions / tall-skinny
contractions. The m-vector is materialized ONLY at chunk/major
boundaries (entry_split/entry_merge) — never inside the inner loop.

Equality-only (the exact quartic line search applies,
reference: src/linesearch.jl:4-127); compile.py enforces eligibility.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .device import DeviceProblem


def _hp(a, b):
    """Full-f32 matmul for tiny low-rank contractions (see
    ops/forward._hp_mm)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def entry_enabled(dp: DeviceProblem) -> bool:
    return dp.ew_c2 is not None


# Under shard_map every (n_pad, n_pad) mask (and the carried v_ew/Λ_ew)
# is ROW-sharded: local block (n_loc, n_pad). The left factor of every
# matmul is the local row block, the right factor is the all-gathered
# full matrix, so products like R·Dᵀ + D·Rᵀ need NO transpose of a
# sharded array; masked reductions psum; the m-vector scatters/gathers
# localize through the shard's row offset.

def _row_offset(dp: DeviceProblem, n_loc: int):
    if dp.spmd_axis is None:
        return 0
    return jax.lax.axis_index(dp.spmd_axis) * n_loc


def _psum(x, dp: DeviceProblem):
    if dp.spmd_axis is None:
        return x
    return jax.lax.psum(x, dp.spmd_axis)


def _full_rows(dp: DeviceProblem, X):
    """All-gather a row-sharded (n_loc, ...) array to (n_pad, ...)."""
    if dp.spmd_axis is None:
        return X
    from .forward import _full

    return _full(dp, X)


def _scatter_sym(dp: DeviceProblem, base, vals):
    """Scatter per-entry values at (rows, cols) AND the mirrored
    positions into the local row block (no-op rows owned elsewhere)."""
    n_loc = base.shape[0]
    off = _row_offset(dp, n_loc)

    def scat(M, rows, cols, v):
        lr = rows - off
        valid = jnp.logical_and(lr >= 0, lr < n_loc)
        lr = jnp.clip(lr, 0, n_loc - 1)
        return M.at[lr, cols].add(jnp.where(valid, v, 0.0))

    M = scat(base, dp.entry_rows, dp.entry_cols, vals)
    offdiag = dp.entry_rows != dp.entry_cols
    return scat(M, dp.entry_cols, dp.entry_rows,
                jnp.where(offdiag, vals, 0.0))


def _n_extra_wide(dp: DeviceProblem) -> int:
    return 0 if dp.extra_wide_w is None else dp.extra_wide_w.shape[0]


def _extra_lowrank(dp: DeviceProblem):
    """Low-rank constraint terms (gid != m) paired with their slot index in
    the extras vector (extras order: wide first, then low-rank by gid)."""
    nw = _n_extra_wide(dp)
    by_gid = {t.gid: t for t in dp.lowrank if t.gid != dp.m}
    return [(nw + i, by_gid[g]) for i, g in enumerate(dp.extra_gids[nw:])]


# --------------------------------------------------------------------------
# m-vector <-> dense-mask conversions (chunk/major boundaries only)
# --------------------------------------------------------------------------

def entry_split(dp: DeviceProblem, vio_raw: jax.Array):
    """(m+1,) raw violations -> (v_ew [n,n], v_ex [n_ex], obj)."""
    v = vio_raw[: dp.m]
    ve = v[dp.entry_gids]
    v_ew = _scatter_sym(dp, jnp.zeros_like(dp.ew_c2), ve)
    if dp.extra_gids:
        v_ex = v[jnp.asarray(dp.extra_gids)]
    else:
        v_ex = jnp.zeros((0,), vio_raw.dtype)
    return v_ew, v_ex, vio_raw[dp.m]


def entry_merge(dp: DeviceProblem, v_ew, v_ex, obj) -> jax.Array:
    """Inverse of entry_split -> (m+1,) with slot m = obj."""
    n_loc = v_ew.shape[0]
    off = _row_offset(dp, n_loc)
    lr = dp.entry_rows - off
    valid = jnp.logical_and(lr >= 0, lr < n_loc)
    ve = jnp.where(
        valid, v_ew[jnp.clip(lr, 0, n_loc - 1), dp.entry_cols], 0.0
    )
    ve = _psum(ve, dp)
    vals = jnp.zeros((dp.m + 1,), v_ew.dtype)
    vals = vals.at[dp.entry_gids].set(ve)
    if dp.extra_gids:
        vals = vals.at[jnp.asarray(dp.extra_gids)].set(v_ex)
    return vals.at[dp.m].set(obj)


def entry_lam(dp: DeviceProblem, lam: jax.Array):
    """λ (m,) -> (Λ_ew [n,n], lam_ex [n_ex]) — loop-invariant inside a
    major iteration."""
    le = lam[dp.entry_gids]
    L = _scatter_sym(dp, jnp.zeros_like(dp.ew_c2).astype(lam.dtype), le)
    if dp.extra_gids:
        lam_ex = lam[jnp.asarray(dp.extra_gids)]
    else:
        lam_ex = jnp.zeros((0,), lam.dtype)
    return L, lam_ex


# --------------------------------------------------------------------------
# inner-loop kernels
# --------------------------------------------------------------------------

def apply_C_entry(dp: DeviceProblem, X: jax.Array) -> jax.Array:
    """C @ X: dense MXU matmul for sparse C, tall-skinny contraction for
    low-rank C (the gid == m term)."""
    X_full = _full_rows(dp, X)
    out = dp.ew_C @ X_full if dp.ew_C is not None else jnp.zeros_like(X)
    for t in dp.lowrank:
        if t.gid == dp.m:
            out = out + _hp(t.B, t.d[:, None] * _psum(_hp(t.B.T, X), dp))
    return out


def gradient_entry(dp: DeviceProblem, R, CR, v_ew, v_ex, Lam_ew, lam_ex,
                   sigma) -> jax.Array:
    """G = 2·S·R with S = C + Σ yᵢAᵢ, y = -(λ - σv) (equality form of
    reference src/coreop.jl:229-317). The entrywise part of S is the
    elementwise ew_v1 ∘ (σ·v_ew − Λ_ew); CR = C@R is maintained
    incrementally by the caller (one matmul per line search serves both
    the objective slope and this term)."""
    S_ew = dp.ew_v1 * (sigma * v_ew - Lam_ew)
    G = S_ew @ _full_rows(dp, R) + CR
    nw = _n_extra_wide(dp)
    y_ex = -(lam_ex - sigma * v_ex)
    if nw:
        G = G + (y_ex[:nw] @ dp.extra_wide_w)[:, None] * R
    for idx, t in _extra_lowrank(dp):
        G = G + y_ex[idx] * _hp(t.B, t.d[:, None] * _psum(_hp(t.B.T, R), dp))
    return 2.0 * G


class EntryLS(NamedTuple):
    alpha: jax.Array
    L_new: jax.Array
    v_ew: jax.Array
    v_ex: jax.Array
    obj: jax.Array
    CD: jax.Array  # C @ D, for the caller's incremental CR update


def linesearch_entry(dp: DeviceProblem, R, D, v_ew, v_ex, obj,
                     Lam_ew, lam_ex, sigma, alpha_max=1.0) -> EntryLS:
    """Exact quartic line search in dense-mask form
    (reference: src/linesearch.jl:4-127). The two forward products are
    q1 = 𝒜(RDᵀ+DRᵀ) = ew_c2 ∘ (RDᵀ+DRᵀ) and q2 = 𝒜(DDᵀ) = ew_c2 ∘ DDᵀ;
    every coefficient dot over constraints is the masked reduction
    Σ H ∘ a ∘ b (+ the tiny extras dot). Commits the step algebraically
    like the reference (src/linesearch.jl:114-126)."""
    from .cubic import minimize_quartic

    H = dp.ew_h
    R_full = _full_rows(dp, R)
    D_full = _full_rows(dp, D)
    # (RDᵀ+DRᵀ) local row block without transposing a sharded array:
    # row i of R·Dᵀ is Rᵢ·D_full, row i of D·Rᵀ is Dᵢ·R_full
    q1_ew = dp.ew_c2 * (R @ D_full.T + D @ R_full.T)  # 𝒜(RDᵀ+DRᵀ)
    q2_ew = dp.ew_c2 * (D @ D_full.T)                 # 𝒜(DDᵀ)

    # extras: wide diagonal constraints are row-sum reductions ...
    nw = _n_extra_wide(dp)
    n_ex = len(dp.extra_gids)
    q1_ex = jnp.zeros((n_ex,), R.dtype)
    q2_ex = jnp.zeros((n_ex,), R.dtype)
    if nw:
        rd = 2.0 * jnp.sum(R * D, axis=1)  # diag(RDᵀ+DRᵀ), local rows
        dd = jnp.sum(D * D, axis=1)
        q1_ex = q1_ex.at[:nw].set(_psum(dp.extra_wide_w @ rd, dp))
        q2_ex = q2_ex.at[:nw].set(_psum(dp.extra_wide_w @ dd, dp))
    # ... and low-rank constraints tall-skinny contractions
    for idx, t in _extra_lowrank(dp):
        rb = _psum(_hp(R.T, t.B), dp)
        db = _psum(_hp(D.T, t.B), dp)
        q1_ex = q1_ex.at[idx].set(2.0 * jnp.sum(t.d * jnp.sum(rb * db, axis=0)))
        q2_ex = q2_ex.at[idx].set(jnp.sum(t.d * jnp.sum(db * db, axis=0)))

    # objective slope terms: one matmul CD serves p1, p2 AND the caller's
    # incremental CR update
    CD = apply_C_entry(dp, D)
    p1 = 2.0 * _psum(jnp.vdot(R, CD), dp)
    p2 = _psum(jnp.vdot(D, CD), dp)

    def cdot(a_ew, b_ew, a_ex, b_ex):
        # masked part is row-sharded (psum); extras are replicated
        return _psum(jnp.sum(H * a_ew * b_ew), dp) + jnp.dot(a_ex, b_ex)

    # quartic coefficients (reference: src/linesearch.jl:20-56)
    e = (obj - cdot(Lam_ew, v_ew, lam_ex, v_ex)
         + sigma * cdot(v_ew, v_ew, v_ex, v_ex) / 2.0)
    d1 = (p1 - cdot(Lam_ew, q1_ew, lam_ex, q1_ex)
          + sigma * cdot(v_ew, q1_ew, v_ex, q1_ex))
    c1 = (p2 - cdot(Lam_ew - sigma * v_ew, q2_ew, lam_ex - sigma * v_ex, q2_ex)
          + sigma * cdot(q1_ew, q1_ew, q1_ex, q1_ex) / 2.0)
    b1 = sigma * cdot(q1_ew, q2_ew, q1_ex, q2_ex)
    a1 = sigma * cdot(q2_ew, q2_ew, q2_ex, q2_ex) / 2.0

    alpha, f_star = minimize_quartic(
        (e, d1, c1, b1, a1), jnp.asarray(alpha_max, dtype=R.dtype)
    )

    return EntryLS(
        alpha=alpha,
        L_new=f_star,
        v_ew=v_ew + alpha * (alpha * q2_ew + q1_ew),
        v_ex=v_ex + alpha * (alpha * q2_ex + q1_ex),
        obj=obj + alpha * (alpha * p2 + p1),
        CD=CD,
    )


def assemble_S_dense(dp: DeviceProblem, y_full: jax.Array) -> jax.Array:
    """Dense S = Σᵢ yᵢAᵢ + y_m·C for the entry mode's Lanczos matvec: built
    ONCE per dual bound (scatter of y at the entry positions + elementwise
    weights + rank-s updates), after which every Lanczos iteration is a
    single (n,n)@(n,1) MXU matvec instead of the gather-path apply_S —
    the dual bound runs q ~ √iter·log n matvecs (reference:
    src/coreop.jl:402), which dominated Lovász-θ solves once the inner
    loop moved to dense-mask form."""
    ye = y_full[dp.entry_gids]
    Y = _scatter_sym(dp, jnp.zeros_like(dp.ew_c2).astype(y_full.dtype), ye)
    S = dp.ew_v1 * Y
    if dp.ew_C is not None:
        S = S + y_full[dp.m] * dp.ew_C
    n_loc = S.shape[0]
    off = _row_offset(dp, n_loc)
    nw = _n_extra_wide(dp)
    if nw:
        # extra_wide_w columns are the LOCAL rows' global positions, so
        # the diagonal contribution lands at (i_local, i_local + offset)
        y_exw = y_full[jnp.asarray(dp.extra_gids[:nw])]
        dvals = y_exw @ dp.extra_wide_w
        i_loc = jnp.arange(n_loc)
        S = S.at[i_loc, i_loc + off].add(dvals)
    for t in dp.lowrank:
        B_full = _full_rows(dp, t.B)
        S = S + y_full[t.gid] * ((t.B * t.d[None, :]) @ B_full.T)
    return S


def vio_norm_entry(dp: DeviceProblem, v_ew, v_ex, pscale) -> jax.Array:
    """‖v‖₂ over constraints (equality-only: no capping,
    reference: src/coreop.jl:22)."""
    sq = _psum(jnp.sum(dp.ew_h * v_ew * v_ew), dp) + jnp.dot(v_ex, v_ex)
    return jnp.sqrt(sq) / pscale


# --------------------------------------------------------------------------
# least-squares dual multiplier (masked-matrix CG)
# --------------------------------------------------------------------------

def ls_dual_entry(dp: DeviceProblem, R, n_cg: int = 25):
    """Least-squares dual multiplier for entry-mode (equality-only)
    families — the Lovász-θ analog of solver/dualbound.ls_dual_head.

    Minimizes ‖S(y)·R‖_F over ALL dual variables: the per-entry edge
    multipliers live as a masked symmetric matrix Z (Z_ij = v_ij·y_ij on
    the entry support), the extras (wide diagonal constraints like θ's
    trace, low-rank couplings) as a small vector a. Solved by CGNR where
    every operator application is dense MXU matmuls:

        A(Z, a)   = Z@R + Σ_w a_w·diag(w)R + Σ_t a_t·B d Bᵀ R
        Aᵀ(res)   = (mask ⊙ sym(res·Rᵀ), [⟨diag(w)R, res⟩], [⟨BdBᵀR, res⟩])

    For θ the resulting bound is exactly the classical dual form
    max_Y λ_min(C + Y_masked) evaluated at the CG solution (any masked Y
    is dual-feasible; all constraints are equalities so there are no sign
    restrictions). Returns y_head (m,). No reference counterpart — the
    reference evaluates only the AL ascent iterate
    (src/coreop.jl:376-415)."""
    import jax

    dtype = R.dtype
    mask = (dp.ew_h != 0).astype(dtype)          # entry support, local rows
    R_f = _full_rows(dp, R)
    nw = _n_extra_wide(dp)
    lr_terms = _extra_lowrank(dp)
    n_ex = nw + len(lr_terms)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    # precompute the extras' fixed factors W_e R (each (n_loc, r))
    WR = []
    for e in range(nw):
        WR.append(dp.extra_wide_w[e][:, None] * R)
    for _, t in lr_terms:
        WR.append(_hp(t.B, t.d[:, None] * _psum(_hp(t.B.T, R), dp)))

    def A_op(Z, a):
        out = Z @ R_f
        for e in range(n_ex):
            out = out + a[e] * WR[e]
        return out

    def At_op(res):
        res_f = _full_rows(dp, res)
        Zg = 0.5 * mask * (_hp(res, R_f.T) + _hp(R, res_f.T))
        ag = jnp.stack(
            [_psum(jnp.sum(WR[e] * res), dp) for e in range(n_ex)]
        ) if n_ex else jnp.zeros((0,), dtype)
        return Zg, ag

    def dot(v1, v2):
        (Z1, a1), (Z2, a2) = v1, v2
        return _psum(jnp.sum(Z1 * Z2), dp) + jnp.dot(a1, a2)

    U = apply_C_entry(dp, R)                      # b = -U
    x = (jnp.zeros_like(mask), jnp.zeros((n_ex,), dtype))
    r = At_op(-U)
    p = r

    def body(_, carry):
        x, r, p, gamma = carry
        s = A_op(*p)
        s2 = _psum(jnp.sum(s * s), dp)
        alpha = gamma / jnp.maximum(s2, tiny)
        x2 = (x[0] + alpha * p[0], x[1] + alpha * p[1])
        dZ, da = At_op(s)
        r2 = (r[0] - alpha * dZ, r[1] - alpha * da)
        gamma2 = dot(r2, r2)
        beta = gamma2 / jnp.maximum(gamma, tiny)
        p2 = (r2[0] + beta * p[0], r2[1] + beta * p[1])
        return x2, r2, p2, gamma2

    gamma0 = dot(r, r)
    x, _, _, _ = jax.lax.fori_loop(0, n_cg, body, (x, r, p, gamma0))
    Z, a = x

    # recover the per-entry multipliers y_e = Z_ij / v_ij (like entry_merge)
    n_loc = Z.shape[0]
    off = _row_offset(dp, n_loc)
    lr_rows = dp.entry_rows - off
    valid = jnp.logical_and(lr_rows >= 0, lr_rows < n_loc)
    Zi = jnp.where(
        valid, Z[jnp.clip(lr_rows, 0, n_loc - 1), dp.entry_cols], 0.0
    )
    vi = jnp.where(
        valid, dp.ew_v1[jnp.clip(lr_rows, 0, n_loc - 1), dp.entry_cols], 1.0
    )
    ye = _psum(Zi / jnp.where(vi == 0, 1.0, vi), dp)
    y_head = jnp.zeros((dp.m,), dtype).at[dp.entry_gids].set(ye)
    if dp.extra_gids:
        y_head = y_head.at[jnp.asarray(dp.extra_gids)].set(a)
    return y_head
