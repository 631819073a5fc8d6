"""Closed-form cubic root solve for the exact quartic line search.

The reference minimizes the quartic AL restriction via numerical
polynomial root finding (PolynomialRoots.jl, reference:
src/linesearch.jl:58-112). Under jit we instead solve the derivative
cubic in closed form (Cardano / trigonometric method) — branch-free,
no libraries, and exact up to floating point. Degenerate (quadratic /
linear) leading coefficients are handled by select, mirroring the
reference's quadratic special case (src/linesearch.jl:70-84).
"""

from __future__ import annotations

import jax.numpy as jnp


def cubic_real_roots(a, b, c, d, eps=None):
    """Real roots of a·x³ + b·x² + c·x + d = 0.

    Returns a length-3 array; invalid slots are NaN. All inputs are traced
    scalars. Complex roots are dropped (NaN).
    """
    dtype = jnp.result_type(a, b, c, d)
    if eps is None:
        eps = jnp.finfo(dtype).eps
    nan = jnp.asarray(jnp.nan, dtype)

    # scale-aware degeneracy tests
    scale = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                        jnp.maximum(jnp.abs(c), jnp.abs(d))) + eps
    is_cubic = jnp.abs(a) > eps * scale
    is_quad = jnp.abs(b) > eps * scale

    # ---- linear: c·x + d = 0 -------------------------------------------------
    lin_root = -d / jnp.where(jnp.abs(c) > 0, c, 1.0)
    lin_roots = jnp.stack([lin_root, nan, nan])

    # ---- quadratic: b·x² + c·x + d = 0 ---------------------------------------
    b_safe = jnp.where(is_quad, b, 1.0)
    disc_q = c * c - 4.0 * b_safe * d
    sq = jnp.sqrt(jnp.maximum(disc_q, 0.0))
    q1 = (-c + sq) / (2.0 * b_safe)
    q2 = (-c - sq) / (2.0 * b_safe)
    qvalid = disc_q >= 0.0
    quad_roots = jnp.stack([
        jnp.where(qvalid, q1, nan),
        jnp.where(qvalid, q2, nan),
        nan,
    ])

    # ---- cubic (depressed form t³ + p·t + q, x = t - b/(3a)) ------------------
    a_safe = jnp.where(is_cubic, a, 1.0)
    bb = b / a_safe
    cc = c / a_safe
    dd = d / a_safe
    p = cc - bb * bb / 3.0
    q = 2.0 * bb**3 / 27.0 - bb * cc / 3.0 + dd
    shift = -bb / 3.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # one real root (disc > 0): Cardano
    sdisc = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sdisc)
    v = jnp.cbrt(-q / 2.0 - sdisc)
    single = u + v + shift

    # three real roots (disc <= 0): trigonometric method
    pm = jnp.minimum(p, -eps)  # p <= 0 in this branch; guard division
    rr = jnp.sqrt(-pm / 3.0)
    cos_arg = jnp.clip(3.0 * q / (2.0 * pm * rr), -1.0, 1.0)
    phi = jnp.arccos(cos_arg)
    k = jnp.arange(3, dtype=dtype)
    triple = 2.0 * rr * jnp.cos((phi - 2.0 * jnp.pi * k) / 3.0) + shift

    one_real = disc > 0.0
    cubic_roots = jnp.where(
        one_real,
        jnp.stack([single, nan, nan]),
        triple,
    )

    return jnp.where(
        is_cubic, cubic_roots, jnp.where(is_quad, quad_roots, lin_roots)
    )


def minimize_quartic(coeffs, alpha_max):
    """argmin over [0, alpha_max] of e + d·α + c·α² + b·α³ + a·α⁴.

    ``coeffs`` = (e, d, c, b, a). Candidates are the real stationary
    points clipped into the interval plus both endpoints — mirroring the
    reference's root-then-compare strategy (src/linesearch.jl:98-112),
    with the endpoints making it robust even when the closed-form roots
    degrade numerically.
    Returns (alpha_star, f_star).
    """
    e, d, c, b, a = coeffs
    # the argmin is invariant under uniform scaling of the derivative
    # coefficients; normalize by their largest magnitude so the Cardano
    # intermediates (squares/cubes of the coefficients) cannot overflow
    # float32 on badly-scaled problems (e.g. μ-conductance's dᵀXd
    # coupling constraint puts the raw coefficients at ~1e13, whose
    # cubes are inf in f32)
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.abs(b)),
        jnp.maximum(jnp.abs(c), jnp.abs(d)),
    )
    scale = jnp.where(scale > 0, scale, 1.0)
    roots = cubic_real_roots(4.0 * a / scale, 3.0 * b / scale,
                             2.0 * c / scale, d / scale)
    zero = jnp.zeros_like(alpha_max)
    cands = jnp.concatenate(
        [roots, jnp.stack([alpha_max, zero])]
    )
    cands = jnp.where(jnp.isnan(cands), 0.0, jnp.clip(cands, 0.0, alpha_max))
    f = e + cands * (d + cands * (c + cands * (b + cands * a)))
    i = jnp.argmin(f)
    return cands[i], f[i]
