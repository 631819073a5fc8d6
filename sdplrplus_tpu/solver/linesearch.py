"""Line searches along a descent direction D for the augmented Lagrangian.

TPU-native re-design of the reference's two line searches:
  * exact quartic line search for equality-only problems
    (reference: src/linesearch.jl:4-127) — the AL along R + αD is a
    degree-4 polynomial whose coefficients come from two forward-operator
    applications; we minimize it with a closed-form cubic solve.
  * Armijo backtracking for inequality problems
    (reference: src/linesearch.jl:139-191) — the sharp AL is piecewise
    quadratic; each candidate α is evaluated in O(m) from the same two
    forward applications; halving runs in a lax.while_loop.

Both commit the step algebraically, without re-evaluating 𝒜:
    vio_raw += α(α·A_DD + A_RD)   (reference: src/linesearch.jl:114-126)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.cubic import minimize_quartic
from ..ops.device import DeviceProblem
from ..ops.forward import A_linesearch

ARMIJO_C = 1e-4
ARMIJO_MAX_HALVINGS = 50


def _products(dp: DeviceProblem, R, D):
    """A_RD = 𝒜(RDᵀ + DRᵀ) (scaled ×2 like the reference,
    src/linesearch.jl:13) and A_DD = 𝒜(DDᵀ); both length m+1, computed in
    one fused gather pass (ops/forward.py A_linesearch)."""
    return A_linesearch(dp, R, D)


def _commit(dp: DeviceProblem, vio_raw, A_RD, A_DD, alpha):
    new_vio = vio_raw + alpha * (alpha * A_DD + A_RD)
    return new_vio


def exact_linesearch(dp: DeviceProblem, R, D, vio_raw, lam, sigma, alpha_max=1.0):
    """Exact quartic line search (equality constraints only).

    Returns (alpha, L_at_alpha, new_vio_raw).
    """
    A_RD, A_DD = _products(dp, R, D)
    return exact_from_products(dp, A_RD, A_DD, vio_raw, lam, sigma, alpha_max)


def exact_from_products(dp: DeviceProblem, A_RD, A_DD, vio_raw, lam, sigma,
                        alpha_max=1.0):
    """Exact quartic line search from precomputed operator products
    (the fast-diagonal path derives them from its single SpMM,
    ops/forward.A_linesearch_cd)."""
    m = dp.m
    dtype = A_RD.dtype

    p0 = vio_raw[m]
    p1 = A_RD[m]
    p2 = A_DD[m]
    neg_q0 = vio_raw[:m]
    q1 = A_RD[:m]
    q2 = A_DD[:m]

    # quartic coefficients (reference: src/linesearch.jl:20-56)
    e = p0 - jnp.dot(lam, neg_q0) + sigma * jnp.dot(neg_q0, neg_q0) / 2.0
    d = p1 - jnp.dot(lam, q1) + sigma * jnp.dot(neg_q0, q1)
    c = p2 - jnp.dot(lam - sigma * neg_q0, q2) + sigma * jnp.dot(q1, q1) / 2.0
    b = sigma * jnp.dot(q1, q2)
    a = sigma * jnp.dot(q2, q2) / 2.0

    alpha_max = jnp.asarray(alpha_max, dtype=dtype)
    alpha, f_star = minimize_quartic((e, d, c, b, a), alpha_max)

    new_vio = _commit(dp, vio_raw, A_RD, A_DD, alpha)
    return alpha, f_star, new_vio


def armijo_linesearch(
    dp: DeviceProblem, R, D, vio_raw, lam, sigma, y_full, alpha_max=1.0
):
    """Armijo backtracking for the sharp AL with inequalities.

    ``y_full`` must be the y vector from the preceding gradient call
    (y[i] = -min(λ_ub, λ - σv)), used for the slope at 0
    (reference: src/linesearch.jl:169-171).
    Returns (alpha, L_at_alpha, new_vio_raw).
    """
    A_RD, A_DD = _products(dp, R, D)
    return armijo_from_products(
        dp, A_RD, A_DD, vio_raw, lam, sigma, y_full, alpha_max
    )


def armijo_from_products(dp: DeviceProblem, A_RD, A_DD, vio_raw, lam, sigma,
                         y_full, alpha_max=1.0):
    """Armijo backtracking from precomputed operator products (see
    exact_from_products)."""
    m = dp.m
    dtype = A_RD.dtype

    def eval_AL(alpha):
        L = vio_raw[m] + alpha * A_RD[m] + alpha * alpha * A_DD[m]
        g = vio_raw[:m] + alpha * A_RD[:m] + alpha * alpha * A_DD[:m]
        lam_t = jnp.minimum(dp.lam_ub, lam - sigma * g)
        return L + jnp.sum(lam_t * lam_t - lam * lam) / (2.0 * sigma)

    L0 = eval_AL(jnp.zeros((), dtype=dtype))
    slope = A_RD[m] + jnp.dot(y_full[:m], A_RD[:m])

    alpha0 = jnp.asarray(alpha_max, dtype=dtype)
    L_a0 = eval_AL(alpha0)

    def cond(carry):
        alpha, L_a, k = carry
        return jnp.logical_and(
            k < ARMIJO_MAX_HALVINGS,
            L_a > L0 + ARMIJO_C * alpha * slope,
        )

    def body(carry):
        alpha, _, k = carry
        alpha = alpha / 2.0
        return alpha, eval_AL(alpha), k + 1

    alpha, L_a, _ = lax.while_loop(cond, body, (alpha0, L_a0, jnp.zeros((), jnp.int32)))

    new_vio = _commit(dp, vio_raw, A_RD, A_DD, alpha)
    return alpha, L_a, new_vio
