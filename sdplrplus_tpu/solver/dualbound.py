"""Dual (suboptimality) bound and DIMACS error report.

TPU-native re-design of the reference's SDPLR+ novelty: the Lanczos-based
suboptimality bound for trace-bounded SDPs (reference:
src/coreop.jl:376-415) and the six DIMACS error metrics
(src/coreop.jl:417-453).

    dual_value = -⟨y[0:m], b⟩ + trace_bound · min(λ_min(S), 0)

with y = [-min(λ_ub, λ - σv); 1] and S = Σ yᵢAᵢ + C.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adjoint import apply_S, assemble_s_tri, gradient
from ..ops.device import DeviceProblem
from ..ops.lanczos import (
    bucket_q_max,
    lanczos_alpha_beta,
    lanczos_alpha_beta_reorth,
    lanczos_q,
    tridiag_min_eig,
    tridiag_min_eig_device_certified,
    tridiag_min_eig_resid,
)

_cert_eig = jax.jit(tridiag_min_eig_device_certified)


@jax.jit
def _y_and_s(dp: DeviceProblem, lam, sigma, vio_raw):
    """Returns (y_full, s_tri, S_dense): s_tri for the general gather-path
    matvec, S_dense (entry mode) for the one-matmul-per-matvec path."""
    m = dp.m
    y_head = -jnp.minimum(dp.lam_ub, lam - sigma * vio_raw[:m])
    y_full = jnp.concatenate([y_head, jnp.ones((1,), dtype=lam.dtype)])
    zero = jnp.zeros((1,), dtype=lam.dtype)
    if getattr(dp, "ew_c2", None) is not None:
        from ..ops.entrymask import assemble_S_dense

        return y_full, zero, assemble_S_dense(dp, y_full)
    if getattr(dp, "fn_apply_S", None) is not None or dp.all_cons_diagonal:
        return y_full, zero, None
    return y_full, assemble_s_tri(dp, y_full), None


def ls_dual_head(dp: DeviceProblem, R, CR=None, y_fallback=None):
    """Generalized least-squares dual multiplier for all-diagonal
    constraint families (dp.ls_eligible; compile._compile_ls_structure).

    Writes S(y) = C + y_w·diag(cw) + Σ_t y_t·B_t d_t B_tᵀ + diag(z) and
    picks the dual variables to (1) minimize ‖S(y)R‖_F — the y making the
    current factor most stationary, which near optimality drives
    λ_min(S) → 0 — then (2) among the minimizers, maximize the linear
    dual term −⟨y,b⟩:

      * low-rank constraint multipliers y_t: closed-form via per-row
        projection (the per-row slack z absorbs any diagonal component,
        so y_t solves tiny normal equations on the projected residuals);
      * per-row diagonal totals w_i = −⟨(CR + Σ y_t·V_t)_i, R_i⟩/‖R_i‖²;
      * the wide/narrow split w_i = y_w·cw_i + z_i: 1-D concave
        piecewise-linear maximization of −⟨y,b⟩ over y_w (breakpoints
        w_i/cw_i), with z realized through the per-row best channel on
        each side (sign-restricted for inequality constraints — the
        result is dual-feasible by construction, so weak duality holds).

    Any y is a valid dual (weak duality); LS quality only affects bound
    tightness. Subsumes the identity-diagonal closed form
    (MaxCut/CutNorm: no wide, unit equality channels ⇒ y_i = w_i).
    No reference counterpart (the reference evaluates only the AL ascent
    iterate, src/coreop.jl:376-415).

    ``CR`` optionally passes a precomputed C_sparse @ R (the fused
    driver's carried CX recurrence). ``y_fallback`` (m,) supplies
    multiplier values (typically the AL ascent iterate) for low-rank
    constraints whose direction vanishes on range(R) — there the LS
    system is blind (e.g. MinBisection's 11ᵀ at any balanced factor,
    where 1ᵀR = 0 exactly) and the fallback is used instead.
    Returns y_head (m,)."""
    from ..ops.forward import _full
    from ..ops.spmm import spmm_C

    hp = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    m = dp.m
    dtype = R.dtype
    if CR is None:
        CR = spmm_C(dp, R)
    lr_cons = []
    for t in dp.lowrank:
        BtR = hp(t.B.T, R)
        if dp.spmd_axis is not None:
            BtR = jax.lax.psum(BtR, dp.spmd_axis)
        ApR = hp(t.B, t.d[:, None] * BtR)
        if t.gid == m:
            CR = CR + ApR          # part of the objective C
        else:
            lr_cons.append((t.gid, ApR))

    den = jnp.maximum(jnp.sum(R * R, axis=1),
                      jnp.asarray(jnp.finfo(dtype).tiny, dtype))

    def rowproj(M):
        return M - (jnp.sum(M * R, axis=1) / den)[:, None] * R

    y_lr = []
    if lr_cons:
        PU = rowproj(CR)
        PVs = [rowproj(V) for _, V in lr_cons]
        G = jnp.stack([
            jnp.stack([jnp.sum(Va * Vb) for Vb in PVs]) for Va in PVs
        ])
        h = jnp.stack([jnp.sum(Va * PU) for Va in PVs])
        Vn = jnp.stack([jnp.sum(V * V) for _, V in lr_cons])
        if dp.spmd_axis is not None:
            G = jax.lax.psum(G, dp.spmd_axis)
            h = jax.lax.psum(h, dp.spmd_axis)
            Vn = jax.lax.psum(Vn, dp.spmd_axis)
        eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        # absolute floor keeps the solve nonsingular when every projected
        # direction vanishes (G ≡ 0); the per-term blindness test below
        # decides what to do with the (then-zero) solution
        delta = eps * (jnp.trace(G) + 1.0)
        G = G + delta * jnp.eye(len(PVs), dtype=dtype)
        a = jnp.linalg.solve(G, -h)
        for i, ((gid, V), at) in enumerate(zip(lr_cons, jnp.unstack(a))):
            if y_fallback is not None:
                # blind direction: ‖ΠV‖² ≪ ‖V‖² means range(R) cannot
                # see this multiplier — use the caller's (AL) value
                blind = G[i, i] <= 1e-6 * Vn[i]
                at = jnp.where(blind, y_fallback[gid], at)
            CR = CR + at * V
            y_lr.append((gid, at))

    w = -jnp.sum(CR * R, axis=1) / den
    # dead/padding rows: no LS information — leave their slack at zero
    alive = jnp.sum(R * R, axis=1) > 0
    w = jnp.where(alive, w, 0.0)
    if dp.spmd_axis is not None:
        w = _full(dp, w[:, None])[:, 0]
        alive = _full(dp, alive[:, None].astype(dtype))[:, 0] > 0

    slope_p, slope_n = dp.ls_slope_pos, dp.ls_slope_neg
    gid_p, gid_n = dp.ls_gid_pos, dp.ls_gid_neg
    has_p, has_n = gid_p < m, gid_n < m

    if dp.ls_wide_gid >= 0:
        cw = dp.ls_cw
        active = (cw > 0) & alive
        # g'(y_w) = -b_w + Σ_active -slope(z_i side)·cw_i; rows flip from
        # the + side to the - side as y_w passes t_i = w_i/cw_i, dropping
        # g' by (slope⁻-slope⁺)·cw_i ≥ 0 each — concave, maximize at the
        # first breakpoint where g' ≤ 0. Missing-side rows pin z to the
        # realizable side (slope contribution of the clipped side is 0).
        sp_eff = jnp.where(has_p, slope_p, 0.0)
        sn_eff = jnp.where(has_n, slope_n, 0.0)
        t_bp = jnp.where(active, w / jnp.maximum(cw, 1e-30), jnp.inf)
        drop = jnp.where(active, (sn_eff - sp_eff) * cw, 0.0)
        b_w = dp.b[dp.ls_wide_gid]
        g0 = -b_w - jnp.sum(jnp.where(active, sp_eff * cw, 0.0))
        order = jnp.argsort(t_bp)
        gp_after = g0 - jnp.cumsum(drop[order])
        # first sorted index whose post-flip derivative <= 0
        idx = jnp.argmax(gp_after <= 0)
        any_neg = jnp.any(gp_after <= 0)
        y_w = jnp.where(any_neg, t_bp[order][idx], 0.0)
        y_w = jnp.where(jnp.isfinite(y_w), y_w, 0.0)
        z = w - y_w * cw
    else:
        y_w = jnp.zeros((), dtype)
        z = w

    # realize z through the per-row channels (clip to realizable sides)
    z = jnp.where(z > 0, jnp.where(has_p, z, 0.0), jnp.where(has_n, z, 0.0))
    gid = jnp.where(z >= 0, gid_p, gid_n)
    v = jnp.where(z >= 0, dp.ls_v_pos, dp.ls_v_neg)
    yv = jnp.where(alive, z / v, 0.0)
    y_head = jnp.zeros((m + 1,), dtype).at[gid].add(
        yv, mode="drop")[:m]
    if dp.ls_wide_gid >= 0:
        y_head = y_head.at[dp.ls_wide_gid].set(y_w)
    for gid_t, at in y_lr:
        y_head = y_head.at[gid_t].set(at)
    return jnp.maximum(y_head, -dp.lam_ub)


def dual_obj(
    dp: DeviceProblem,
    lam,
    sigma,
    vio_raw,
    trace_bound: float,
    iter_count: int,
    key,
    highprecision: bool = False,
    safeguard: bool = True,
    R=None,
    block: tuple | None = None,
    margin_target: float = 0.0,
    R_seed=None,
):
    """Returns (dual_value, min_eig, y_full) (reference: src/coreop.jl:376-415).

    With ``safeguard`` (default) the Lanczos Ritz value is corrected by
    its residual bound β_k·|s_k| before entering the dual value, so the
    reported dual is a certified-in-practice LOWER estimate and duality
    gaps cannot go negative from an unconverged eigensolve (round-1 fix;
    the reference uses the raw Ritz value, src/coreop.jl:503-511).

    When ``R`` is passed and the problem is LS-eligible (all-diagonal
    constraint families, dp.ls_eligible), the bound is evaluated at the
    generalized least-squares multiplier y = argmin ‖S(y)R‖_F (then
    max −⟨y,b⟩ among minimizers) instead of the AL ascent iterate,
    mirroring the fused driver (solver/major.py dual_bound).

    ``block`` = (b, k_max) switches to the block-Lanczos kernel
    (ops/blocklanczos.py): ONE b-lane operator pass per step, the start
    block seeded with ``R_seed`` (or ``R``), early exit once the
    certified margin drops below ``margin_target`` (λ units). The block
    path is always residual-safeguarded."""
    if R is not None and getattr(dp, "ew_c2", None) is not None:
        from ..ops.entrymask import ls_dual_entry

        y_ls_head = ls_dual_entry(dp, R)
        return dual_obj(dp, -y_ls_head, jnp.zeros_like(sigma),
                        jnp.zeros_like(vio_raw), trace_bound, iter_count,
                        key, highprecision=highprecision,
                        safeguard=safeguard, block=block,
                        margin_target=margin_target, R_seed=R)
    if R is not None and getattr(dp, "ls_eligible", False):
        y_al = -jnp.minimum(dp.lam_ub, lam - sigma * vio_raw[: dp.m])
        y_ls_head = ls_dual_head(dp, R, y_fallback=y_al)
        # re-express as (lam, sigma=0, v=0): y = -min(lam_ub, lam)
        return dual_obj(dp, -y_ls_head, jnp.zeros_like(sigma),
                        jnp.zeros_like(vio_raw), trace_bound, iter_count,
                        key, highprecision=highprecision,
                        safeguard=safeguard, block=block,
                        margin_target=margin_target, R_seed=R)
    y_full, s_tri, S_dense = _y_and_s(dp, lam, sigma, vio_raw)

    if block is not None and block[0] > 0:
        from ..ops.blocklanczos import block_lanczos_min_eig

        k_min = min(max(4, int(np.ceil(np.log2(max(dp.n, 2))))),
                    int(block[1]))
        theta, margin, _ = block_lanczos_min_eig(
            dp, s_tri, y_full, key, R_seed, margin_target,
            jnp.asarray(k_min, jnp.int32), b=int(block[0]),
            k_max=int(block[1]), S_dense=S_dense,
        )
        min_eig = float(theta) - float(margin)
        yb = float(jnp.dot(y_full[: dp.m], dp.b))
        return -yb + float(trace_bound) * min(min_eig, 0.0), min_eig, y_full

    if highprecision:
        q_max = bucket_q_max(min(max(100, 2 * lanczos_q(iter_count, dp.n)), dp.n))
        alpha, beta, k_eff = lanczos_alpha_beta_reorth(
            dp, s_tri, y_full, key, q_max=q_max, S_dense=S_dense
        )
    else:
        q = lanczos_q(iter_count, dp.n)
        q_max = bucket_q_max(q)
        alpha, beta, k_eff = lanczos_alpha_beta(
            dp, s_tri, y_full, key, jnp.asarray(q, jnp.int32), q_max=q_max,
            S_dense=S_dense,
        )

    if safeguard:
        if q_max > 1024:
            # host fallback past the device Sturm kernel's proven range
            # (the 2048 bucket reproducibly faulted the remote TPU
            # worker): the (q,) α/β arrays are already host-bound here
            # and scipy's eigh_tridiagonal is exact in f64
            theta_h, margin_h = tridiag_min_eig_resid(
                np.asarray(alpha), np.asarray(beta), int(k_eff)
            )
            min_eig = theta_h - margin_h
        else:
            # same device algorithm (Sturm bisection + inverse iteration)
            # the fused driver uses, so both drivers report identical
            # duals
            theta_d, margin_d = _cert_eig(alpha, beta, k_eff)
            min_eig = float(theta_d) - float(margin_d)
    else:
        min_eig = tridiag_min_eig(
            np.asarray(alpha), np.asarray(beta), int(k_eff)
        )
    yb = float(jnp.dot(y_full[: dp.m], dp.b))
    dual_value = -yb + float(trace_bound) * min(min_eig, 0.0)
    return dual_value, min_eig, y_full


def dimacs_errors(dp: DeviceProblem, R, lam, vio_raw, obj, key) -> np.ndarray:
    """Six standard DIMACS error metrics (reference: src/coreop.jl:417-453).

    err2 = err3 = 0 by construction (X = RRᵀ ⪰ 0, Z = C - 𝒜ᵀλ).
    """
    m = dp.m
    normb = float(jnp.linalg.norm(dp.b))
    err1 = float(jnp.linalg.norm(vio_raw[:m])) / (1.0 + normb)

    # S with y = [-λ; 1] (reference: copy2y_λ!, src/coreop.jl:238-246)
    y_full = jnp.concatenate([-lam, jnp.ones((1,), dtype=lam.dtype)])
    if getattr(dp, "fn_apply_S", None) is not None or dp.all_cons_diagonal:
        s_tri = jnp.zeros((1,), dtype=lam.dtype)
    else:
        s_tri = assemble_s_tri(dp, y_full)
    q_max = bucket_q_max(min(100, dp.n))
    alpha, beta, k_eff = lanczos_alpha_beta_reorth(
        dp, s_tri, y_full, key, q_max=q_max
    )
    min_eig, margin = tridiag_min_eig_resid(
        np.asarray(alpha), np.asarray(beta), int(k_eff)
    )
    # conservative: under-estimate λ_min so err4 is never optimistic
    err4 = max(0.0, -(min_eig - margin)) / (1.0 + dp.normC)
    bty = float(jnp.dot(lam, dp.b))
    obj = float(obj)
    err5 = (obj - bty) / (1.0 + abs(obj) + abs(bty))
    SR = apply_S(dp, s_tri, y_full, R)
    err6 = float(jnp.vdot(R, SR)) / (1.0 + abs(obj) + abs(bty))
    return np.array([err1, 0.0, 0.0, err4, err5, err6])
