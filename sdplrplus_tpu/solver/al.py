"""Augmented-Lagrangian value and combined value+gradient.

TPU-native re-design of the reference's f!/fg! (reference:
src/coreop.jl:11-31,319-349). Unified equality/inequality formula:

    ℒ(R, λ, σ) = ⟨C, RRᵀ⟩ + Σᵢ (λ̃ᵢ² - λᵢ²) / (2σ),   λ̃ᵢ = min(λ_ub, λᵢ - σvᵢ)

with v = 𝒜(RRᵀ) - b the *raw* violations. Equality (λ_ub = ∞) reduces to
-λᵀv + σ/2‖v‖²; inequality (λ_ub = 0) is the sharp AL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.adjoint import gradient
from ..ops.device import DeviceProblem
from ..ops.forward import A_uu, _psum


def al_value(dp: DeviceProblem, R, lam, sigma):
    """Returns (L, vio_raw) where vio_raw is length m+1 with slot m = obj."""
    m = dp.m
    av = A_uu(dp, R)
    obj = av[m]
    v = av[:m] - dp.b
    lam_t = jnp.minimum(dp.lam_ub, lam - sigma * v)
    L = obj + jnp.sum(lam_t * lam_t - lam * lam) / (2.0 * sigma)
    vio_raw = jnp.concatenate([v, obj[None]])
    return L, vio_raw


def capped_vio(dp: DeviceProblem, vio_raw):
    """primal_vio[i] = max(raw, lb): equality keeps both signs, inequality
    caps at 0 (reference: src/coreop.jl:22,340-342)."""
    return jnp.maximum(vio_raw[: dp.m], dp.vio_lb)


def norms(dp: DeviceProblem, G, vio_raw, gtol_relative: bool, ptol_relative: bool):
    grad_norm = jnp.sqrt(_psum(jnp.sum(G * G), dp))
    if gtol_relative:
        grad_norm = grad_norm / dp.normC
    vio_norm = jnp.linalg.norm(capped_vio(dp, vio_raw))
    if ptol_relative:
        vio_norm = vio_norm / dp.normb
    return grad_norm, vio_norm


def al_value_grad(dp: DeviceProblem, R, lam, sigma,
                  gtol_relative: bool, ptol_relative: bool):
    """fg! equivalent (reference: src/coreop.jl:323-349).

    Returns (L, vio_raw, G, y_full, grad_norm, vio_norm).
    """
    L, vio_raw = al_value(dp, R, lam, sigma)
    G, y_full, _ = gradient(dp, R, lam, sigma, vio_raw)
    grad_norm, vio_norm = norms(dp, G, vio_raw, gtol_relative, ptol_relative)
    return L, vio_raw, G, y_full, grad_norm, vio_norm


def al_value_grad_cx(dp: DeviceProblem, R, lam, sigma,
                     gtol_relative: bool, ptol_relative: bool):
    """fg! on the fast-diagonal path: ONE SpMM (CX = C_sparse @ R) serves
    objective, constraints, and gradient (ops/spmm.py design note).

    Returns (L, vio_raw, G, y_full, grad_norm, vio_norm, CX); CX seeds the
    carried recurrence of the inner loop (solver/inner.py).
    """
    from ..ops.adjoint import gradient_cx
    from ..ops.forward import A_uu_cx, _full
    from ..ops.spmm import spmm_C

    m = dp.m
    CX = spmm_C(dp, R)
    av = A_uu_cx(dp, R, CX)
    obj = av[m]
    v = av[:m] - dp.b
    lam_t = jnp.minimum(dp.lam_ub, lam - sigma * v)
    L = obj + jnp.sum(lam_t * lam_t - lam * lam) / (2.0 * sigma)
    vio_raw = jnp.concatenate([v, obj[None]])
    G, y_full = gradient_cx(dp, R, CX, lam, sigma, vio_raw)
    grad_norm, vio_norm = norms(dp, G, vio_raw, gtol_relative, ptol_relative)
    return L, vio_raw, G, y_full, grad_norm, vio_norm, CX
