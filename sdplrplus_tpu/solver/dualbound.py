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


def _ls_multiplier(dp: DeviceProblem, R):
    """Closed-form least-squares multiplier on identity-diagonal families:
    y_i = −⟨(CR)ᵢ, Rᵢ⟩ / ‖Rᵢ‖² = argmin_y ‖(C + diag(y))·R‖_F, clamped to
    the dual-feasible region (λ ≤ λ_ub). See solver/major.py dual_bound."""
    from ..ops.forward import _full
    from ..ops.spmm import spmm_C

    CR = spmm_C(dp, _full(dp, R))
    for t in dp.lowrank:  # diag_identity ⇒ all low-rank terms belong to C
        hp = lambda a, b: jnp.matmul(
            a, b, precision=jax.lax.Precision.HIGHEST)
        CR = CR + hp(t.B, t.d[:, None] * hp(t.B.T, R))
    num = jnp.sum(CR * R, axis=1)
    den = jnp.maximum(jnp.sum(R * R, axis=1),
                      jnp.asarray(jnp.finfo(R.dtype).tiny, R.dtype))
    y = -(num / den)
    return jnp.maximum(y[: dp.m], -dp.lam_ub)


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
):
    """Returns (dual_value, min_eig, y_full) (reference: src/coreop.jl:376-415).

    With ``safeguard`` (default) the Lanczos Ritz value is corrected by
    its residual bound β_k·|s_k| before entering the dual value, so the
    reported dual is a certified-in-practice LOWER estimate and duality
    gaps cannot go negative from an unconverged eigensolve (round-1 fix;
    the reference uses the raw Ritz value, src/coreop.jl:503-511).

    When ``R`` is passed and the problem is identity-diagonal
    (dp.diag_identity), the bound is evaluated at the closed-form
    least-squares multiplier y = argmin ‖S(y)R‖_F instead of the AL
    ascent iterate, mirroring the fused driver
    (solver/major.py dual_bound)."""
    if R is not None and getattr(dp, "diag_identity", False):
        y_ls_head = _ls_multiplier(dp, R)
        # re-express as (lam, sigma=0, v=0): y = -min(lam_ub, lam)
        return dual_obj(dp, -y_ls_head, jnp.zeros_like(sigma),
                        jnp.zeros_like(vio_raw), trace_bound, iter_count,
                        key, highprecision=highprecision,
                        safeguard=safeguard)
    y_full, s_tri, S_dense = _y_and_s(dp, lam, sigma, vio_raw)

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
        # same device algorithm (Sturm bisection + inverse iteration) the
        # fused driver uses, so both drivers report identical duals
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
