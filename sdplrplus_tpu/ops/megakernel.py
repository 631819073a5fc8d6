"""Pallas TPU megakernel: the ENTIRE inner L-BFGS loop in one kernel.

The lax.while_loop inner chunk (solver/inner.py) is already one compiled
program per dispatch, but each iteration still issues dozens of XLA ops
(~64 us/iteration at G1 shapes, dominated by per-op overhead, not FLOPs:
the two 896x896x16 matmuls are ~1 us of MXU time). For dense-MXU-mode
problems the whole working set fits in VMEM (C at n_pad=896 is 3.2 MB),
so this kernel runs the complete loop on-core — direction (two-loop
recursion over an in-VMEM ring buffer), descent fallback, exact quartic
line search (closed-form cubic on the scalar unit), the step, the
gradient, norms, the fprec stagnation test and the L-BFGS push — at a
few microseconds per iteration (measured v5e slopes: the
(16,896)@(896,896) f32 matmul is ~0.45 us; the rest is VPU/scalar work).

Functionally identical to inner_chunk (reference: src/sdplr.jl:190-278);
tests/test_megakernel.py checks equivalence against the XLA path.

TPU-specific choices:
  * the factor lives TRANSPOSED, (r_pad, n_pad): n fills the 128-lane
    axis so elementwise ops and the per-row (axis-0) reductions that
    diagonal constraints need are fully lane-parallel,
  * ONE matmul per iteration: the line search needs CD = D@C, and the
    gradient's C@(R+aD) is maintained incrementally as CR += a*CD
    (the same algebra as the reference's algebraic violation update,
    reference: src/linesearch.jl:114-126),
  * all 8 quartic-coefficient dot products come from ONE tiny (4,n)@(n,4)
    MXU Gram matmul,
  * the cubic solve runs on the scalar unit with an fdlibm-style acos
    (Mosaic has no acos/atan2/cbrt lowering) plus one Newton polish of
    each stationary point,
  * L-BFGS history is a (k*r_pad, n) VMEM ring mutated in place through
    the kernel's output refs; rho lives in SMEM scratch.

Eligibility (checked by ``megakernel_eligible``): dense MXU mode,
equality constraints only, every sparse constraint = one diagonal entry
(row<->constraint bijection), single device, f32 on TPU. That covers the
MaxCut / CutNorm / MinimumBisection benchmark families (reference:
exps/test.jl:166-176); everything else stays on the XLA path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .device import DeviceProblem

_PI = 3.141592653589793


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


# --------------------------------------------------------------------------
# scalar math helpers (Mosaic lowers cos/sin/exp/log/sqrt but NOT
# acos/atan2/cbrt — built here from lowerable primitives)
# --------------------------------------------------------------------------

def _asin_core(t):
    """asin for |t| <= ~0.71 (fdlibm single-precision rational minimax)."""
    z = t * t
    p = z * (0.16666586697 + z * (-0.042743422091 + z * (-0.0086563630030)))
    q = 1.0 + z * (-0.70662963390)
    return t + t * (p / q)


def _acos(x):
    ax = jnp.abs(x)
    r_small = _PI / 2.0 - _asin_core(x)
    s = jnp.sqrt(jnp.maximum((1.0 - ax) * 0.5, 0.0))
    w = 2.0 * _asin_core(s)
    r_large = jnp.where(x >= 0.0, w, _PI - w)
    return jnp.where(ax <= 0.5, r_small, r_large)


def _cbrt(x):
    tiny = 1e-38
    ax = jnp.maximum(jnp.abs(x), tiny)
    r = jnp.exp(jnp.log(ax) / 3.0)
    r = (2.0 * r + ax / (r * r)) / 3.0  # one Newton polish
    return jnp.where(jnp.abs(x) < 2.0 * tiny, jnp.zeros_like(x), jnp.sign(x) * r)


def _cubic_roots(a, b, c, d, eps):
    """Real roots of a x^3 + b x^2 + c x + d; returns (roots[3], valid[3]).

    Same algebra as ops/cubic.py cubic_real_roots but NaN-free (validity
    flags instead) and built only from Mosaic-lowerable scalar ops.
    """
    one = jnp.ones((), a.dtype)
    false = jnp.zeros((), bool)
    scale = jnp.maximum(jnp.maximum(jnp.abs(a), jnp.abs(b)),
                        jnp.maximum(jnp.abs(c), jnp.abs(d))) + eps
    is_cubic = jnp.abs(a) > eps * scale
    is_quad = jnp.abs(b) > eps * scale

    # linear
    lin_root = -d / jnp.where(jnp.abs(c) > 0, c, one)

    # quadratic
    b_safe = jnp.where(is_quad, b, one)
    disc_q = c * c - 4.0 * b_safe * d
    sq = jnp.sqrt(jnp.maximum(disc_q, 0.0))
    quad1 = (-c + sq) / (2.0 * b_safe)
    quad2 = (-c - sq) / (2.0 * b_safe)
    qvalid = disc_q >= 0.0

    # cubic, depressed form t^3 + p t + q, x = t - b/(3a)
    a_safe = jnp.where(is_cubic, a, one)
    bb = b / a_safe
    cc = c / a_safe
    dd = d / a_safe
    p = cc - bb * bb / 3.0
    q = 2.0 * bb * bb * bb / 27.0 - bb * cc / 3.0 + dd
    shift = -bb / 3.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    sdisc = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = _cbrt(-q / 2.0 + sdisc)
    v = _cbrt(-q / 2.0 - sdisc)
    single = u + v + shift

    pm = jnp.minimum(p, -eps)
    rr = jnp.sqrt(-pm / 3.0)
    cos_arg = jnp.clip(3.0 * q / (2.0 * pm * rr), -1.0, 1.0)
    phi = _acos(cos_arg)
    t0 = 2.0 * rr * jnp.cos(phi / 3.0) + shift
    t1 = 2.0 * rr * jnp.cos((phi - 2.0 * _PI) / 3.0) + shift
    t2 = 2.0 * rr * jnp.cos((phi - 4.0 * _PI) / 3.0) + shift

    one_real = disc > 0.0
    c0 = jnp.where(one_real, single, t0)
    c1 = jnp.where(one_real, single, t1)
    c2 = jnp.where(one_real, single, t2)
    r0 = jnp.where(is_cubic, c0, jnp.where(is_quad, quad1, lin_root))
    r1 = jnp.where(is_cubic, c1, quad2)
    r2 = c2
    v0 = is_cubic | ~is_quad                         # cubic / linear always
    v1 = jnp.where(is_cubic, ~one_real, is_quad & qvalid)
    v2 = jnp.where(is_cubic, ~one_real, false)
    return (r0, r1, r2), (v0, v1, v2)


def _minimize_quartic(e, d1, c1, b1, a1, alpha_max, eps):
    """argmin over [0, alpha_max] of e + d1 a + c1 a^2 + b1 a^3 + a1 a^4.

    Scalar-unit port of ops/cubic.py minimize_quartic: closed-form roots
    of the derivative cubic, one Newton polish each (cleans up the acos
    approximation error), clip into the interval, compare against the
    endpoints.
    """
    zero = jnp.zeros_like(alpha_max)
    (r0, r1, r2), (v0, v1, v2) = _cubic_roots(
        4.0 * a1, 3.0 * b1, 2.0 * c1, d1, eps
    )

    def fval(x):
        return e + x * (d1 + x * (c1 + x * (b1 + x * a1)))

    def polish(x):
        fp = d1 + x * (2.0 * c1 + x * (3.0 * b1 + x * 4.0 * a1))
        fpp = 2.0 * c1 + x * (6.0 * b1 + x * 12.0 * a1)
        ok = jnp.abs(fpp) > eps
        step = fp / jnp.where(ok, fpp, jnp.ones_like(fpp))
        return jnp.where(ok, x - step, x)

    cands = [
        jnp.clip(jnp.where(v, polish(r), zero), 0.0, alpha_max)
        for r, v in ((r0, v0), (r1, v1), (r2, v2))
    ] + [alpha_max, zero]

    best_a = cands[0]
    best_f = fval(cands[0])
    for cand in cands[1:]:
        f = fval(cand)
        take = f < best_f
        best_a = jnp.where(take, cand, best_a)
        best_f = jnp.where(take, f, best_f)
    return best_a, best_f


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MegaSpec:
    """Static layout/config for one megakernel specialization."""

    n_pad: int
    rp: int                 # padded rank (sublane multiple of 8)
    k: int                  # L-BFGS ring length (>= 1; use_hist gates use)
    use_hist: bool          # False when numlbfgsvecs == 0
    gscale: float           # grad-norm divisor (normC if relative)
    lr_sizes: Tuple[int, ...]       # s of each low-rank term
    lr_is_obj: Tuple[bool, ...]     # True: term belongs to the objective
    lr_gids: Tuple[int, ...] = ()   # global constraint ids (wrapper only)
    alpha_max: float = 1.0
    # Armijo variant (μ-conductance-class families): J diagonal
    # constraint channels per row, n_wide wide diagonal constraints,
    # inequality multipliers via the sharp AL + backtracking line search
    # (reference: src/linesearch.jl:139-191). armijo=False is the exact-
    # quartic equality kernel above.
    armijo: bool = False
    J: int = 1              # diagonal constraint channels per row
    n_wide: int = 0         # wide diagonal constraints
    wide_gids: Tuple[int, ...] = ()   # their global ids (wrapper only)

    @property
    def n_lr(self):
        return len(self.lr_sizes)

    @property
    def lr_cons(self):
        return tuple(t for t in range(self.n_lr) if not self.lr_is_obj[t])

    @property
    def n_scal_out(self):
        return 7 + self.k + max(len(self.lr_cons), 1) + self.n_wide


def _make_kernel(spec: MegaSpec):
    n, rp, k = spec.n_pad, spec.rp, spec.k
    n_lr = spec.n_lr
    lr_cons = list(spec.lr_cons)
    n_lc = len(lr_cons)

    # scal layout: [sigma, cur_gtol, stag_tol, max_steps, head_in,
    #               rho_in[0..k-1], lam_lr_cons..., b_lr_cons...]
    OFF_RHO = 5
    OFF_LAM = OFF_RHO + k
    OFF_B = OFF_LAM + n_lc
    # oscal layout: [L, obj, gnorm, steps, stagnated, alpha_last, head_out,
    #                rho_out[0..k-1], vio_lr...]
    O_RHO = 7
    O_VLR = O_RHO + k

    def kernel(scal_ref, C_ref, Rt_ref, lam_ref, w_ref, b_ref,
               s_in_ref, y_in_ref, *rest):
        lr_B = rest[0:n_lr]                       # (n, s_t) VMEM
        lr_Bdt = rest[n_lr:2 * n_lr]              # (s_t, n) VMEM, d-scaled
        lr_d = rest[2 * n_lr:3 * n_lr]            # (1, s_t) VMEM
        (Rt_out, G_out, vio_out, s_out, y_out, oscal, rho_smem) = \
            rest[3 * n_lr:]

        dtype = Rt_ref.dtype
        eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
        sigma = scal_ref[0]
        cur_gtol = scal_ref[1]
        stag_tol = scal_ref[2]
        max_steps = scal_ref[3].astype(jnp.int32)
        head0 = scal_ref[4].astype(jnp.int32)
        gscale = jnp.asarray(spec.gscale, dtype)
        alpha_cap = jnp.asarray(spec.alpha_max, dtype)

        lam = lam_ref[:]       # (1, n) row-ordered duals
        w = w_ref[:]           # (1, n) diagonal constraint weights
        b = b_ref[:]           # (1, n) row-ordered rhs
        lam_lr_cons = [scal_ref[OFF_LAM + i] for i in range(n_lc)]
        b_lr_cons = [scal_ref[OFF_B + i] for i in range(n_lc)]

        # history ring: caller's state in, mutated in place via out refs
        s_out[:] = s_in_ref[:]
        y_out[:] = y_in_ref[:]
        for i in range(k):
            rho_smem[i] = scal_ref[OFF_RHO + i]

        def dot2(A, B):
            return jnp.sum(A * B)

        def lr_tr(Qa, Qb, t):
            return jnp.sum(Qa * Qb * lr_d[t][:])

        def state_of(Rt, CRt, Q):
            obj = dot2(Rt, CRt)
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    obj = obj + lr_tr(Q[t], Q[t], t)
            vio = w * jnp.sum(Rt * Rt, axis=0, keepdims=True) - b  # (1, n)
            vio_lr = tuple(lr_tr(Q[t], Q[t], t) - b_lr_cons[i]
                           for i, t in enumerate(lr_cons))
            return obj, vio, vio_lr

        def al_of(obj, vio, vio_lr):
            L = obj - dot2(lam, vio) + 0.5 * sigma * dot2(vio, vio)
            for i in range(n_lc):
                L = L - lam_lr_cons[i] * vio_lr[i] \
                    + 0.5 * sigma * vio_lr[i] * vio_lr[i]
            return L

        def grad_of(Rt, CRt, Q, vio, vio_lr):
            y_row = -(lam - sigma * vio)               # (1, n), equality
            G = 2.0 * (CRt + (w * y_row) * Rt)
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    y_t = jnp.ones((), dtype)
                else:
                    y_t = -(lam_lr_cons[lr_cons.index(t)]
                            - sigma * vio_lr[lr_cons.index(t)])
                G = G + 2.0 * y_t * jnp.dot(
                    Q[t], lr_Bdt[t][:], preferred_element_type=dtype,
                    precision=lax.Precision.HIGHEST,
                )
            return G

        # ---- initial state from R (one-time; the loop maintains it) ----
        Rt0 = Rt_ref[:]
        CRt0 = jnp.dot(Rt0, C_ref[:], preferred_element_type=dtype)
        # low-rank contractions run at HIGHEST precision: the default
        # bf16-pass MXU dot loses ~8 mantissa bits, and coupling terms
        # like MinBisection's 1ᵀX1 = 0 are pure cancellations near
        # feasibility (absolute bf16 noise ~n·2⁻⁸ vs a true value → 0;
        # G5 f32 diverged to NaN through exactly this). The (n, s) dots
        # are tiny next to the n×n matmul, so the 5.6× slowdown is free.
        Q0 = tuple(jnp.dot(Rt0, lr_B[t][:], preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)
                   for t in range(n_lr))               # (rp, s_t)
        obj0, vio0, vio_lr0 = state_of(Rt0, CRt0, Q0)
        L0 = al_of(obj0, vio0, vio_lr0)
        G0 = grad_of(Rt0, CRt0, Q0, vio0, vio_lr0)
        gnorm0 = jnp.sqrt(dot2(G0, G0)) / gscale

        def body(carry):
            (Rt, CRt, G, vio, vio_lr, obj, L_val, _gnorm, head, steps,
             _stag, _alpha_prev, Q) = carry

            # ---- direction: two-loop recursion over the VMEM ring ------
            if spec.use_hist:
                q = G
                a_vals = []
                for i in range(k):
                    jj = jnp.remainder(head - i, k)
                    off = pl.multiple_of(jj * rp, rp)
                    s_j = s_out[pl.ds(off, rp), :]
                    y_j = y_out[pl.ds(off, rp), :]
                    rho_j = rho_smem[jj]
                    a = rho_j * dot2(s_j, q)
                    q = q - a * y_j
                    a_vals.append((jj, a))
                for i in range(k - 1, -1, -1):
                    jj, a = a_vals[i]
                    off = pl.multiple_of(jj * rp, rp)
                    s_j = s_out[pl.ds(off, rp), :]
                    y_j = y_out[pl.ds(off, rp), :]
                    bq = rho_smem[jj] * dot2(y_j, q)
                    q = q + (a - bq) * s_j
                direction = -q
                descent = dot2(direction, G)
                bad = jnp.logical_or(descent != descent, descent >= 0.0)
                direction = jnp.where(bad, -G, direction)
            else:
                direction = -G

            # ---- exact quartic line search ------------------------------
            CDt = jnp.dot(direction, C_ref[:], preferred_element_type=dtype)
            p1 = 2.0 * dot2(Rt, CDt)
            p2 = dot2(direction, CDt)
            q1 = 2.0 * w * jnp.sum(Rt * direction, axis=0, keepdims=True)
            q2 = w * jnp.sum(direction * direction, axis=0, keepdims=True)

            # all pairwise dots among [lam, vio, q1, q2]: one MXU Gram.
            # HIGHEST precision — the quartic coefficients feed the
            # stagnation test, and default (bf16-pass) matmul noise there
            # trips it ~3x too early (the XLA path computes these dots as
            # full-f32 VPU reductions).
            M4 = jnp.concatenate([lam, vio, q1, q2], axis=0)    # (4, n)
            Gm = jnp.dot(M4, M4.T, preferred_element_type=dtype,
                         precision=lax.Precision.HIGHEST)

            Qd = tuple(
                jnp.dot(direction, lr_B[t][:], preferred_element_type=dtype,
                        precision=lax.Precision.HIGHEST)
                for t in range(n_lr)
            )
            p1_lr = [2.0 * lr_tr(Q[t], Qd[t], t) for t in range(n_lr)]
            p2_lr = [lr_tr(Qd[t], Qd[t], t) for t in range(n_lr)]
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    p1 = p1 + p1_lr[t]
                    p2 = p2 + p2_lr[t]

            e = obj - Gm[0, 1] + 0.5 * sigma * Gm[1, 1]
            d1 = p1 - Gm[0, 2] + sigma * Gm[1, 2]
            c1 = p2 - Gm[0, 3] + sigma * Gm[1, 3] + 0.5 * sigma * Gm[2, 2]
            b1 = sigma * Gm[2, 3]
            a1 = 0.5 * sigma * Gm[3, 3]
            for i, t in enumerate(lr_cons):
                lq1, lq2, lv = p1_lr[t], p2_lr[t], vio_lr[i]
                e = e - lam_lr_cons[i] * lv + 0.5 * sigma * lv * lv
                d1 = d1 - lam_lr_cons[i] * lq1 + sigma * lv * lq1
                c1 = c1 - lam_lr_cons[i] * lq2 + sigma * lv * lq2 \
                    + 0.5 * sigma * lq1 * lq1
                b1 = b1 + sigma * lq1 * lq2
                a1 = a1 + 0.5 * sigma * lq2 * lq2

            alpha, L_new = _minimize_quartic(e, d1, c1, b1, a1,
                                             alpha_cap, eps)

            # ---- algebraic commit + incremental products ----------------
            vio_new = vio + alpha * (alpha * q2 + q1)
            vio_lr_new = tuple(
                vio_lr[i] + alpha * (alpha * p2_lr[t] + p1_lr[t])
                for i, t in enumerate(lr_cons)
            )
            obj_new = obj + alpha * (alpha * p2 + p1)
            Rt_new = Rt + alpha * direction
            CRt_new = CRt + alpha * CDt
            Q_new = tuple(Q[t] + alpha * Qd[t] for t in range(n_lr))

            # ---- gradient + norms --------------------------------------
            G_new = grad_of(Rt_new, CRt_new, Q_new, vio_new, vio_lr_new)
            gnorm_new = jnp.sqrt(dot2(G_new, G_new)) / gscale

            rel_delta = (L_val - L_new) / jnp.maximum(
                jnp.ones((), dtype),
                jnp.maximum(jnp.abs(L_new), jnp.abs(L_val)),
            )
            stag_new = rel_delta < stag_tol

            # ---- L-BFGS push (skipped when stagnating, like the XLA path)
            if spec.use_hist:
                head_new = jnp.remainder(head + 1, k)
                off = head_new * rp
                s_new = alpha * direction
                y_new = G_new - G
                ys = dot2(y_new, s_new)
                s_old = s_out[pl.ds(off, rp), :]
                y_old = y_out[pl.ds(off, rp), :]
                keep = stag_new
                s_out[pl.ds(off, rp), :] = jnp.where(keep, s_old, s_new)
                y_out[pl.ds(off, rp), :] = jnp.where(keep, y_old, y_new)
                rho_smem[head_new] = jnp.where(
                    keep, rho_smem[head_new], 1.0 / ys
                )
                head_out = jnp.where(keep, head, head_new)
            else:
                head_out = head

            return (Rt_new, CRt_new, G_new, vio_new, vio_lr_new, obj_new,
                    L_new, gnorm_new, head_out, steps + 1, stag_new,
                    alpha, Q_new)

        def cond(carry):
            gnorm = carry[7]
            steps = carry[9]
            stag = carry[10]
            return jnp.logical_and(
                gnorm > cur_gtol,
                jnp.logical_and(steps < max_steps, jnp.logical_not(stag)),
            )

        init = (Rt0, CRt0, G0, vio0, vio_lr0, obj0, L0, gnorm0,
                head0, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                jnp.zeros((), dtype), Q0)
        (Rt_f, _CRt, G_f, vio_f, vio_lr_f, obj_f, L_f, gnorm_f, head_f,
         steps_f, stag_f, alpha_f, _Q) = lax.while_loop(cond, body, init)

        Rt_out[:] = Rt_f
        G_out[:] = G_f
        vio_out[:] = vio_f
        oscal[0] = L_f
        oscal[1] = obj_f
        oscal[2] = gnorm_f
        oscal[3] = steps_f.astype(dtype)
        oscal[4] = stag_f.astype(dtype)
        oscal[5] = alpha_f
        oscal[6] = head_f.astype(dtype)
        for i in range(k):
            oscal[O_RHO + i] = rho_smem[i]
        for i in range(len(lr_cons)):
            oscal[O_VLR + i] = vio_lr_f[i]

    return kernel


def _make_kernel_armijo(spec: MegaSpec):
    """The Armijo (inequality) megakernel: the inner loop for
    μ-conductance-class families — J diagonal constraint channels per
    row (each with its own multiplier/rhs/upper bound), wide diagonal
    constraints, low-rank equality terms — using the SHARP augmented
    Lagrangian ℒ = obj + Σ(λ̃² − λ²)/(2σ), λ̃ = min(λ_ub, λ − σv), and a
    backtracking line search with the Armijo condition
    (reference: src/linesearch.jl:139-191, src/coreop.jl:11-31).
    All channel math is (J, n) lane-parallel VPU work; the only matmuls
    per iteration are CD = D@C and the tiny low-rank contractions."""
    n, rp, k = spec.n_pad, spec.rp, spec.k
    J, n_w = spec.J, spec.n_wide
    n_lr = spec.n_lr
    lr_cons = list(spec.lr_cons)
    n_lc = len(lr_cons)

    # scal layout: [sigma, cur_gtol, stag_tol, max_steps, head_in,
    #   rho_in[k], lam_lr[n_lc], b_lr[n_lc], lam_w[n_w], b_w[n_w],
    #   ub_w[n_w]]
    OFF_RHO = 5
    OFF_LAM_LR = OFF_RHO + k
    OFF_B_LR = OFF_LAM_LR + n_lc
    OFF_LAM_W = OFF_B_LR + n_lc
    OFF_B_W = OFF_LAM_W + n_w
    OFF_UB_W = OFF_B_W + n_w
    # oscal layout: [L, obj, gnorm, steps, stag, alpha, head, rho[k],
    #   vio_lr[max(n_lc,1)], vio_w[n_w]]
    O_RHO = 7
    O_VLR = O_RHO + k
    O_VW = O_VLR + max(n_lc, 1)

    def kernel(scal_ref, C_ref, Rt_ref, LAM_ref, W_ref, B_ref, UB_ref,
               WW_ref, s_in_ref, y_in_ref, *rest):
        lr_B = rest[0:n_lr]
        lr_Bdt = rest[n_lr:2 * n_lr]
        lr_d = rest[2 * n_lr:3 * n_lr]
        (Rt_out, G_out, vio_out, s_out, y_out, oscal, rho_smem) = \
            rest[3 * n_lr:]

        dtype = Rt_ref.dtype
        eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
        sigma = scal_ref[0]
        cur_gtol = scal_ref[1]
        stag_tol = scal_ref[2]
        max_steps = scal_ref[3].astype(jnp.int32)
        head0 = scal_ref[4].astype(jnp.int32)
        gscale = jnp.asarray(spec.gscale, dtype)
        alpha_cap = jnp.asarray(spec.alpha_max, dtype)

        LAM = LAM_ref[:]       # (J, n)
        W = W_ref[:]           # (J, n)
        Bc = B_ref[:]          # (J, n)
        UB = UB_ref[:]         # (J, n) (+inf for equalities/padding)
        WWv = WW_ref[:]        # (max(n_w,1), n)
        lam_lr = [scal_ref[OFF_LAM_LR + i] for i in range(n_lc)]
        b_lr = [scal_ref[OFF_B_LR + i] for i in range(n_lc)]
        lam_w = [scal_ref[OFF_LAM_W + i] for i in range(n_w)]
        b_w = [scal_ref[OFF_B_W + i] for i in range(n_w)]
        ub_w = [scal_ref[OFF_UB_W + i] for i in range(n_w)]

        s_out[:] = s_in_ref[:]
        y_out[:] = y_in_ref[:]
        for i in range(k):
            rho_smem[i] = scal_ref[OFF_RHO + i]

        def dot2(A, B2):
            return jnp.sum(A * B2)

        def lr_tr(Qa, Qb, t):
            return jnp.sum(Qa * Qb * lr_d[t][:])

        def tilde(lam, vio, ub):
            return jnp.minimum(ub, lam - sigma * vio)

        def sharp_sum(lt, lam):
            return jnp.sum(lt * lt - lam * lam) / (2.0 * sigma)

        def state_of(Rt, CRt, Q):
            obj = dot2(Rt, CRt)
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    obj = obj + lr_tr(Q[t], Q[t], t)
            rv = jnp.sum(Rt * Rt, axis=0, keepdims=True)      # (1, n)
            vio = W * rv - Bc                                  # (J, n)
            vio_w = tuple(jnp.sum(WWv[i:i + 1] * rv) - b_w[i]
                          for i in range(n_w))
            vio_lr = tuple(lr_tr(Q[t], Q[t], t) - b_lr[i]
                           for i, t in enumerate(lr_cons))
            return obj, vio, vio_w, vio_lr

        def al_of(obj, vio, vio_w, vio_lr):
            L = obj + sharp_sum(tilde(LAM, vio, UB), LAM)
            for i in range(n_w):
                lt = tilde(lam_w[i], vio_w[i], ub_w[i])
                L = L + (lt * lt - lam_w[i] * lam_w[i]) / (2.0 * sigma)
            for i in range(n_lc):
                lt = lam_lr[i] - sigma * vio_lr[i]   # equality: ub = inf
                L = L + (lt * lt - lam_lr[i] * lam_lr[i]) / (2.0 * sigma)
            return L

        def grad_of(Rt, CRt, Q, vio, vio_w, vio_lr):
            # y = -λ̃ per constraint; row multiplier folds every diagonal
            # channel and wide constraint into one (1, n) row
            y_ch = -tilde(LAM, vio, UB)                        # (J, n)
            mu_row = jnp.sum(W * y_ch, axis=0, keepdims=True)  # (1, n)
            for i in range(n_w):
                y_w = -tilde(lam_w[i], vio_w[i], ub_w[i])
                mu_row = mu_row + y_w * WWv[i:i + 1]
            G = 2.0 * (CRt + mu_row * Rt)
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    y_t = jnp.ones((), dtype)
                else:
                    i = lr_cons.index(t)
                    y_t = -(lam_lr[i] - sigma * vio_lr[i])
                G = G + 2.0 * y_t * jnp.dot(
                    Q[t], lr_Bdt[t][:], preferred_element_type=dtype,
                    precision=lax.Precision.HIGHEST,
                )
            return G

        Rt0 = Rt_ref[:]
        CRt0 = jnp.dot(Rt0, C_ref[:], preferred_element_type=dtype)
        Q0 = tuple(jnp.dot(Rt0, lr_B[t][:], preferred_element_type=dtype,
                           precision=lax.Precision.HIGHEST)
                   for t in range(n_lr))
        obj0, vio0, vio_w0, vio_lr0 = state_of(Rt0, CRt0, Q0)
        L0 = al_of(obj0, vio0, vio_w0, vio_lr0)
        G0 = grad_of(Rt0, CRt0, Q0, vio0, vio_w0, vio_lr0)
        gnorm0 = jnp.sqrt(dot2(G0, G0)) / gscale

        def body(carry):
            (Rt, CRt, G, vio, vio_w, vio_lr, obj, L_val, _gn, head, steps,
             _stag, _ap, Q) = carry

            if spec.use_hist:
                q = G
                a_vals = []
                for i in range(k):
                    jj = jnp.remainder(head - i, k)
                    off = pl.multiple_of(jj * rp, rp)
                    s_j = s_out[pl.ds(off, rp), :]
                    y_j = y_out[pl.ds(off, rp), :]
                    a = rho_smem[jj] * dot2(s_j, q)
                    q = q - a * y_j
                    a_vals.append((jj, a))
                for i in range(k - 1, -1, -1):
                    jj, a = a_vals[i]
                    off = pl.multiple_of(jj * rp, rp)
                    s_j = s_out[pl.ds(off, rp), :]
                    y_j = y_out[pl.ds(off, rp), :]
                    bq = rho_smem[jj] * dot2(y_j, q)
                    q = q + (a - bq) * s_j
                direction = -q
                descent = dot2(direction, G)
                bad = jnp.logical_or(descent != descent, descent >= 0.0)
                direction = jnp.where(bad, -G, direction)
            else:
                direction = -G

            # ---- line-search products (shared by every candidate α) ----
            CDt = jnp.dot(direction, C_ref[:], preferred_element_type=dtype)
            p1 = 2.0 * dot2(Rt, CDt)
            p2 = dot2(direction, CDt)
            rv1 = 2.0 * jnp.sum(Rt * direction, axis=0, keepdims=True)
            rv2 = jnp.sum(direction * direction, axis=0, keepdims=True)
            q1 = W * rv1                                       # (J, n)
            q2 = W * rv2
            q1_w = [jnp.sum(WWv[i:i + 1] * rv1) for i in range(n_w)]
            q2_w = [jnp.sum(WWv[i:i + 1] * rv2) for i in range(n_w)]
            Qd = tuple(
                jnp.dot(direction, lr_B[t][:], preferred_element_type=dtype,
                        precision=lax.Precision.HIGHEST)
                for t in range(n_lr)
            )
            p1_lr = [2.0 * lr_tr(Q[t], Qd[t], t) for t in range(n_lr)]
            p2_lr = [lr_tr(Qd[t], Qd[t], t) for t in range(n_lr)]
            for t in range(n_lr):
                if spec.lr_is_obj[t]:
                    p1 = p1 + p1_lr[t]
                    p2 = p2 + p2_lr[t]

            def L_at(alpha):
                vio_a = vio + alpha * (alpha * q2 + q1)
                obj_a = obj + alpha * (alpha * p2 + p1)
                L = obj_a + sharp_sum(tilde(LAM, vio_a, UB), LAM)
                for i in range(n_w):
                    va = vio_w[i] + alpha * (alpha * q2_w[i] + q1_w[i])
                    lt = tilde(lam_w[i], va, ub_w[i])
                    L = L + (lt * lt - lam_w[i] * lam_w[i]) / (2.0 * sigma)
                for i, t in enumerate(lr_cons):
                    va = vio_lr[i] + alpha * (alpha * p2_lr[t] + p1_lr[t])
                    lt = lam_lr[i] - sigma * va
                    L = L + (lt * lt - lam_lr[i] * lam_lr[i]) \
                        / (2.0 * sigma)
                return L

            # ---- Armijo backtracking (c = 1e-4, ≤50 halvings,
            #      reference: src/linesearch.jl:173-181) ---------------
            slope0 = dot2(G, direction)
            c_armijo = jnp.asarray(1e-4, dtype)

            def ls_cond(cc):
                alpha, t, L_a = cc
                return jnp.logical_and(
                    L_a > L_val + c_armijo * alpha * slope0, t < 50
                )

            def ls_body(cc):
                alpha, t, _ = cc
                alpha2 = alpha * 0.5
                return alpha2, t + 1, L_at(alpha2)

            alpha, _, L_new = lax.while_loop(
                ls_cond, ls_body,
                (alpha_cap, jnp.zeros((), jnp.int32), L_at(alpha_cap)),
            )

            vio_new = vio + alpha * (alpha * q2 + q1)
            vio_w_new = tuple(
                vio_w[i] + alpha * (alpha * q2_w[i] + q1_w[i])
                for i in range(n_w)
            )
            vio_lr_new = tuple(
                vio_lr[i] + alpha * (alpha * p2_lr[t] + p1_lr[t])
                for i, t in enumerate(lr_cons)
            )
            obj_new = obj + alpha * (alpha * p2 + p1)
            Rt_new = Rt + alpha * direction
            CRt_new = CRt + alpha * CDt
            Q_new = tuple(Q[t] + alpha * Qd[t] for t in range(n_lr))

            G_new = grad_of(Rt_new, CRt_new, Q_new, vio_new, vio_w_new,
                            vio_lr_new)
            gnorm_new = jnp.sqrt(dot2(G_new, G_new)) / gscale

            rel_delta = (L_val - L_new) / jnp.maximum(
                jnp.ones((), dtype),
                jnp.maximum(jnp.abs(L_new), jnp.abs(L_val)),
            )
            stag_new = rel_delta < stag_tol

            if spec.use_hist:
                head_new = jnp.remainder(head + 1, k)
                off = head_new * rp
                s_new = alpha * direction
                y_new = G_new - G
                ys = dot2(y_new, s_new)
                s_old = s_out[pl.ds(off, rp), :]
                y_old = y_out[pl.ds(off, rp), :]
                keep = stag_new
                s_out[pl.ds(off, rp), :] = jnp.where(keep, s_old, s_new)
                y_out[pl.ds(off, rp), :] = jnp.where(keep, y_old, y_new)
                rho_smem[head_new] = jnp.where(
                    keep, rho_smem[head_new], 1.0 / ys
                )
                head_out = jnp.where(keep, head, head_new)
            else:
                head_out = head

            return (Rt_new, CRt_new, G_new, vio_new, vio_w_new,
                    vio_lr_new, obj_new, L_new, gnorm_new, head_out,
                    steps + 1, stag_new, alpha, Q_new)

        def cond(carry):
            gnorm = carry[8]
            steps = carry[10]
            stag = carry[11]
            return jnp.logical_and(
                gnorm > cur_gtol,
                jnp.logical_and(steps < max_steps, jnp.logical_not(stag)),
            )

        init = (Rt0, CRt0, G0, vio0, vio_w0, vio_lr0, obj0, L0, gnorm0,
                head0, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                jnp.zeros((), dtype), Q0)
        (Rt_f, _CRt, G_f, vio_f, vio_w_f, vio_lr_f, obj_f, L_f, gnorm_f,
         head_f, steps_f, stag_f, alpha_f, _Q) = lax.while_loop(
            cond, body, init)

        Rt_out[:] = Rt_f
        G_out[:] = G_f
        vio_out[:] = vio_f
        oscal[0] = L_f
        oscal[1] = obj_f
        oscal[2] = gnorm_f
        oscal[3] = steps_f.astype(dtype)
        oscal[4] = stag_f.astype(dtype)
        oscal[5] = alpha_f
        oscal[6] = head_f.astype(dtype)
        for i in range(k):
            oscal[O_RHO + i] = rho_smem[i]
        for i in range(n_lc):
            oscal[O_VLR + i] = vio_lr_f[i]
        for i in range(n_w):
            oscal[O_VW + i] = vio_w_f[i]

    return kernel


def _call_kernel(spec: MegaSpec, interpret: bool, dtype,
                 scal, C, Rt, lam_row, w_row, b_row, s_in, y_in, lr_args):
    n, rp, k = spec.n_pad, spec.rp, spec.k
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rp, n), dtype),        # Rt
        jax.ShapeDtypeStruct((rp, n), dtype),        # G
        jax.ShapeDtypeStruct((1, n), dtype),         # vio (row order)
        jax.ShapeDtypeStruct((k * rp, n), dtype),    # s_hist ring
        jax.ShapeDtypeStruct((k * rp, n), dtype),    # y_hist ring
        jax.ShapeDtypeStruct((spec.n_scal_out,), dtype),
    )
    out_specs = (vspec, vspec, vspec, vspec, vspec, sspec)
    in_specs = [sspec] + [vspec] * (7 + 3 * spec.n_lr)
    return pl.pallas_call(
        _make_kernel(spec),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((k,), dtype)],
        interpret=interpret,
    )(scal, C, Rt, lam_row, w_row, b_row, s_in, y_in, *lr_args)


def _call_kernel_armijo(spec: MegaSpec, interpret: bool, dtype,
                        scal, C, Rt, LAM, W, Bc, UB, WW, s_in, y_in,
                        lr_args):
    n, rp, k = spec.n_pad, spec.rp, spec.k
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((rp, n), dtype),        # Rt
        jax.ShapeDtypeStruct((rp, n), dtype),        # G
        jax.ShapeDtypeStruct((spec.J, n), dtype),    # vio channels
        jax.ShapeDtypeStruct((k * rp, n), dtype),    # s_hist ring
        jax.ShapeDtypeStruct((k * rp, n), dtype),    # y_hist ring
        jax.ShapeDtypeStruct((spec.n_scal_out,), dtype),
    )
    out_specs = (vspec, vspec, vspec, vspec, vspec, sspec)
    in_specs = [sspec] + [vspec] * (9 + 3 * spec.n_lr)
    return pl.pallas_call(
        _make_kernel_armijo(spec),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((k,), dtype)],
        interpret=interpret,
    )(scal, C, Rt, LAM, W, Bc, UB, WW, s_in, y_in, *lr_args)


# --------------------------------------------------------------------------
# eligibility + the inner_chunk-compatible wrapper
# --------------------------------------------------------------------------

MAX_LR_TERMS = 4
VMEM_BUDGET_BYTES = 12 * 1024 * 1024
MAX_DIAG_CHANNELS = 4


def _vmem_ok(dp, r, k):
    rp = _round_up(max(r, 1), 8)
    kk = max(k, 1)
    hist = 2 * kk * rp * dp.n_pad * 4
    work = 10 * rp * dp.n_pad * 4
    return dp.n_pad * dp.n_pad * 4 + hist + work <= VMEM_BUDGET_BYTES


def _mega_common_ok(dp, r, k, dtype) -> bool:
    if getattr(dp, "fn_A_uu", None) is not None:
        return False  # external-model adapter: no compiled structure
    if dp.spmd_axis is not None or getattr(dp, "ew_c2", None) is not None:
        return False
    if (jax.default_backend() == "tpu"
            and jnp.dtype(dtype) != jnp.dtype(jnp.float32)):
        return False
    if len(dp.lowrank) > MAX_LR_TERMS:
        return False
    # low-rank constraints must be equalities (λ_ub = ∞) in both kernels
    if any(t.gid < dp.m and np.isfinite(np.asarray(dp.lam_ub)[t.gid])
           for t in dp.lowrank):
        return False
    return _vmem_ok(dp, r, k)


def megakernel_eligible(dp: DeviceProblem, r: int, k: int,
                        use_armijo: bool, dtype) -> bool:
    """True when a dense-VMEM megakernel can run this problem — the
    exact-quartic equality kernel, or the Armijo variant for inequality
    / multi-channel / wide-constraint diagonal families
    (see module docstrings for the constraint-structure requirements)."""
    if not _mega_common_ok(dp, r, k, dtype):
        return False
    if use_armijo or dp.has_inequalities or dp.wide_gids:
        # Armijo variant: every sparse constraint entry diagonal, a
        # bounded number of channels per row, wide constraints diagonal
        # (wide_diag_w rows exist exactly when all_cons_diagonal), and
        # every narrow constraint has exactly ONE diagonal entry (the
        # per-slot channel violation w·rv − b is only that constraint's
        # value under this bijection)
        if not (dp.all_cons_diagonal
                and dp.diag_width <= MAX_DIAG_CHANNELS
                and len(dp.wide_gids) <= 2):
            return False
        cid = np.asarray(dp.diag_cid).ravel()
        counts = np.bincount(cid[cid < dp.m], minlength=max(dp.m, 1))
        skip = set(dp.wide_gids) | {t.gid for t in dp.lowrank}
        return all(
            counts[g] == 1 for g in range(dp.m) if g not in skip
        )
    if getattr(dp, "C_dense", None) is None:
        return False
    if dp.diag_width != 1:
        return False
    # row<->constraint bijection: every non-lowrank constraint id appears
    # exactly once on the diagonal
    cid = np.asarray(dp.diag_cid)[:, 0]
    lr_gids = {t.gid for t in dp.lowrank}
    counts = np.bincount(cid[cid < dp.m], minlength=max(dp.m, 1))
    for g in range(dp.m):
        want = 0 if g in lr_gids else 1
        if counts[g] != want:
            return False
    return True


class MegaData(NamedTuple):
    """Problem arrays the megakernel needs, as a traced pytree — so the
    same compiled caller (host wrapper or fused major driver) is reused
    across solves of identical shapes."""

    C: jax.Array          # (n_pad, n_pad) dense cost
    cid_dev: jax.Array    # (n_pad,) row -> constraint id (m = none)
    w_row: jax.Array      # (1, n_pad) diagonal weights
    b_row: jax.Array      # (1, n_pad) row-ordered rhs
    b_lr: jax.Array       # (n_lr_cons,) rhs of low-rank constraints
    lam_ub: jax.Array     # (m,)
    vio_lb: jax.Array     # (m,)
    lr_args: Tuple        # flattened (B, Bdt, d1s) per low-rank term


class MegaDataA(NamedTuple):
    """Problem arrays for the Armijo megakernel variant."""

    C: jax.Array          # (n_pad, n_pad) dense cost (densified here)
    cid_ch: jax.Array     # (J, n_pad) int32 channel -> constraint id
    W_ch: jax.Array       # (J, n_pad) channel weights
    B_ch: jax.Array       # (J, n_pad) channel rhs
    UB_ch: jax.Array      # (J, n_pad) channel λ upper bounds
    WW: jax.Array         # (max(n_wide,1), n_pad) wide weight rows
    b_wide: jax.Array     # (n_wide,)
    ub_wide: jax.Array    # (n_wide,)
    b_lr: jax.Array       # (n_lr_cons,)
    lam_ub: jax.Array     # (m,)
    vio_lb: jax.Array     # (m,)
    lr_args: Tuple


def _densify_C(dp: DeviceProblem) -> np.ndarray:
    """Dense sparse-part-of-C from the compiled two-tier ELL layout
    (padding slots carry value 0, so blanket adds are safe)."""
    n_pad = dp.n_pad
    C = np.zeros((n_pad, n_pad))
    cols = np.asarray(dp.ell_cols)
    vals = np.asarray(dp.cell_val, dtype=np.float64)
    rows = np.repeat(np.arange(n_pad), cols.shape[1])
    np.add.at(C, (rows, cols.reshape(-1)), vals.reshape(-1))
    if dp.has_ell2:
        r2 = np.asarray(dp.ell2_rows)
        c2 = np.asarray(dp.ell2_cols)
        v2 = np.asarray(dp.cell2_val, dtype=np.float64)
        rr = np.repeat(r2, c2.shape[1])
        np.add.at(C, (rr, c2.reshape(-1)), v2.reshape(-1))
    return C


def prepare_mega_data_armijo(dp: DeviceProblem, *, k: int,
                             gtol_relative: bool, ptol_relative: bool):
    """Host-side prep for the Armijo megakernel: split the diagonal
    constraint slots into per-row channels (wide constraints moved to
    their dense weight rows), densify C from the ELL layout, carry
    per-channel rhs / λ-upper-bound rows."""
    dtype = dp.dtype
    m, n_pad = dp.m, dp.n_pad
    kk = max(k, 1)
    J = max(dp.diag_width, 1)

    cid = np.asarray(dp.diag_cid).astype(np.int64)        # (n_pad, J)
    w = np.asarray(dp.diag_w, dtype=np.float64)
    wide_gids = list(dp.wide_gids)
    is_wide = np.isin(cid, wide_gids)
    cid_ch = np.where(is_wide, m, cid)
    w_ch = np.where(is_wide, 0.0, w)

    b_np = np.asarray(dp.b, dtype=np.float64)
    ub_np = np.asarray(dp.lam_ub, dtype=np.float64)
    b_ext = np.concatenate([b_np, [0.0]]) if m else np.zeros(1)
    ub_ext = np.concatenate([ub_np, [np.inf]]) if m else np.full(1, np.inf)
    B_ch = b_ext[np.minimum(cid_ch, m)]
    UB_ch = ub_ext[np.minimum(cid_ch, m)]

    WW = np.asarray(dp.wide_diag_w, dtype=np.float64)
    if WW.shape[0] == 0:
        WW = np.zeros((1, n_pad))

    lr_terms = list(dp.lowrank)
    lr_args = []
    for t in lr_terms:
        B = t.B.astype(dtype)
        Bdt = t.d[:, None].astype(dtype) * t.B.T.astype(dtype)
        d1s = t.d.astype(dtype).reshape(1, -1)
        lr_args += [B, Bdt, d1s]
    lr_cons_gids = [t.gid for t in lr_terms if t.gid != m]

    meta = dict(
        n_pad=n_pad, m=m, kk=kk, use_hist=k > 0,
        gscale=float(dp.normC if gtol_relative else 1.0),
        pscale=float(dp.normb if ptol_relative else 1.0),
        lr_sizes=tuple(int(t.B.shape[1]) for t in lr_terms),
        lr_is_obj=tuple(t.gid == m for t in lr_terms),
        lr_gids=tuple(t.gid for t in lr_terms),
        dtype=str(jnp.dtype(dtype)),
        armijo=True, J=J, n_wide=len(wide_gids),
        wide_gids=tuple(int(g) for g in wide_gids),
    )
    data = MegaDataA(
        C=jnp.asarray(_densify_C(dp), dtype),
        cid_ch=jnp.asarray(cid_ch.T, jnp.int32),          # (J, n_pad)
        W_ch=jnp.asarray(w_ch.T, dtype),
        B_ch=jnp.asarray(B_ch.T, dtype),
        UB_ch=jnp.asarray(UB_ch.T, dtype),
        WW=jnp.asarray(WW, dtype),
        b_wide=jnp.asarray(b_np[wide_gids], dtype),
        ub_wide=jnp.asarray(ub_np[wide_gids], dtype),
        b_lr=jnp.asarray([b_np[g] for g in lr_cons_gids], dtype),
        lam_ub=dp.lam_ub,
        vio_lb=dp.vio_lb,
        lr_args=tuple(lr_args),
    )
    return meta, data


def prepare_mega_data(dp: DeviceProblem, *, k: int, gtol_relative: bool,
                      ptol_relative: bool):
    """Host-side index prep shared by both integration points. Returns
    (meta, MegaData) where meta carries the spec ingredients."""
    if dp.has_inequalities or dp.wide_gids or dp.diag_width != 1 \
            or getattr(dp, "C_dense", None) is None:
        return prepare_mega_data_armijo(
            dp, k=k, gtol_relative=gtol_relative,
            ptol_relative=ptol_relative,
        )
    dtype = dp.dtype
    m, n_pad = dp.m, dp.n_pad
    kk = max(k, 1)

    cid = np.asarray(dp.diag_cid)[:, 0].astype(np.int64)   # (n_pad,)
    w_np = np.asarray(dp.diag_w)[:, 0]
    valid = cid < m
    b_np = np.asarray(dp.b, dtype=np.float64)
    b_row_np = np.where(
        valid, b_np[np.minimum(cid, max(m - 1, 0))], 0.0
    ) if m else np.zeros(n_pad)
    cid_dev = jnp.asarray(np.where(valid, cid, m), jnp.int32)

    lr_terms = list(dp.lowrank)
    lr_args = []
    for t in lr_terms:
        B = t.B.astype(dtype)
        Bdt = t.d[:, None].astype(dtype) * t.B.T.astype(dtype)
        d1s = t.d.astype(dtype).reshape(1, -1)
        lr_args += [B, Bdt, d1s]
    lr_cons_gids = [t.gid for t in lr_terms if t.gid != m]

    meta = dict(
        n_pad=n_pad, m=m, kk=kk, use_hist=k > 0,
        gscale=float(dp.normC if gtol_relative else 1.0),
        pscale=float(dp.normb if ptol_relative else 1.0),
        lr_sizes=tuple(int(t.B.shape[1]) for t in lr_terms),
        lr_is_obj=tuple(t.gid == m for t in lr_terms),
        lr_gids=tuple(t.gid for t in lr_terms),
        dtype=str(jnp.dtype(dtype)),
    )
    data = MegaData(
        C=dp.C_dense,
        cid_dev=cid_dev,
        w_row=jnp.asarray(w_np, dtype).reshape(1, n_pad),
        b_row=jnp.asarray(b_row_np, dtype).reshape(1, n_pad),
        b_lr=jnp.asarray([b_np[g] for g in lr_cons_gids], dtype),
        lam_ub=dp.lam_ub,
        vio_lb=dp.vio_lb,
        lr_args=tuple(lr_args),
    )
    return meta, data


def mega_spec_for(meta: dict, r: int) -> MegaSpec:
    return MegaSpec(
        n_pad=meta["n_pad"], rp=_round_up(max(r, 1), 8), k=meta["kk"],
        use_hist=meta["use_hist"], gscale=meta["gscale"],
        lr_sizes=meta["lr_sizes"], lr_is_obj=meta["lr_is_obj"],
        lr_gids=meta["lr_gids"],
        armijo=bool(meta.get("armijo", False)),
        J=int(meta.get("J", 1)),
        n_wide=int(meta.get("n_wide", 0)),
        wide_gids=tuple(meta.get("wide_gids", ())),
    )


def mega_chunk_traced_armijo(spec: MegaSpec, r: int, m: int,
                             interpret: bool, pscale: float,
                             data: MegaDataA, R, lbfgs, lam, sigma,
                             cur_gtol, stag_tol, max_steps):
    """inner_chunk-contract wrapper around the Armijo megakernel."""
    from ..solver.inner import InnerCarry
    from ..solver.lbfgs import LBFGSState

    dtype = R.dtype
    n_pad, rp, kk = spec.n_pad, spec.rp, spec.k
    J, n_w = spec.J, spec.n_wide
    n_lc = len(spec.lr_cons)

    Rt = jnp.zeros((rp, n_pad), dtype).at[:r].set(R.T)
    lam_ext = jnp.concatenate([lam, jnp.zeros((1,), dtype)])
    LAM = jnp.take(lam_ext, data.cid_ch.reshape(-1)).reshape(J, n_pad)

    def to_kern(h):
        ht = jnp.swapaxes(h, 1, 2)
        ht = jnp.zeros((kk, rp, n_pad), dtype).at[:, :r].set(ht)
        return ht.reshape(kk * rp, n_pad)

    def from_kern(h2):
        ht = h2.reshape(kk, rp, n_pad)[:, :r]
        return jnp.swapaxes(ht, 1, 2)

    lr_gid_cons = [g for t, g in enumerate(spec.lr_gids)
                   if not spec.lr_is_obj[t]]
    scal = jnp.concatenate([
        jnp.stack([
            jnp.asarray(sigma, dtype),
            jnp.asarray(cur_gtol, dtype),
            jnp.asarray(stag_tol, dtype),
            jnp.asarray(max_steps, dtype),
            lbfgs.head.astype(dtype),
        ]),
        lbfgs.rho.astype(dtype),
        (jnp.stack([lam[g] for g in lr_gid_cons]) if lr_gid_cons
         else jnp.zeros((0,), dtype)),
        data.b_lr.astype(dtype),
        (jnp.stack([lam[g] for g in spec.wide_gids]) if n_w
         else jnp.zeros((0,), dtype)),
        data.b_wide.astype(dtype),
        data.ub_wide.astype(dtype),
    ])

    (Rt_o, G_o, vio_o, s_o, y_o, osc) = _call_kernel_armijo(
        spec, interpret, dtype, scal, data.C, Rt, LAM, data.W_ch,
        data.B_ch, data.UB_ch, data.WW,
        to_kern(lbfgs.s_hist), to_kern(lbfgs.y_hist), data.lr_args,
    )

    R_new = Rt_o[:r].T
    G_new = G_o[:r].T
    obj = osc[1]
    O_VLR = 7 + kk
    O_VW = O_VLR + max(n_lc, 1)
    # scatter channel violations to the m-vector; padding slots write
    # slot m, which the obj/wide/lr sets below overwrite
    vio_raw = jnp.zeros((m + 1,), dtype)
    vio_raw = vio_raw.at[data.cid_ch.reshape(-1)].set(vio_o.reshape(-1))
    for i, g in enumerate(spec.wide_gids):
        vio_raw = vio_raw.at[g].set(osc[O_VW + i])
    for i, g in enumerate(lr_gid_cons):
        vio_raw = vio_raw.at[g].set(osc[O_VLR + i])
    vio_raw = vio_raw.at[m].set(obj)

    lam_t = jnp.minimum(data.lam_ub, lam - sigma * vio_raw[:m])
    y_full = jnp.concatenate([-lam_t, jnp.ones((1,), dtype)])

    new_lbfgs = LBFGSState(
        s_hist=from_kern(s_o),
        y_hist=from_kern(y_o),
        rho=osc[7:7 + kk],
        head=osc[6].astype(jnp.int32),
        sty=jnp.zeros((kk, kk), dtype),
        yty=jnp.zeros((kk, kk), dtype),
    )
    carry = InnerCarry(
        R=R_new, G=G_new, y_full=y_full, vio_raw=vio_raw,
        L_val=osc[0], grad_norm=osc[2],
        lbfgs=new_lbfgs,
        steps=osc[3].astype(jnp.int32),
        stagnated=osc[4] > 0,
    )
    vio = jnp.maximum(vio_raw[:m], data.vio_lb)
    vio_norm = jnp.linalg.norm(vio) / pscale
    return carry, vio_norm


def mega_chunk_traced(spec: MegaSpec, r: int, m: int, interpret: bool,
                      pscale: float, data,
                      R, lbfgs, lam, sigma, cur_gtol, stag_tol, max_steps):
    """Pure traced megakernel chunk — callable from any jitted context
    (the host wrapper's jit, or inside the fused major driver's
    while_loop). Returns (InnerCarry, vio_norm), the inner_chunk contract
    of solver/inner.py. Dispatches to the Armijo variant when the spec
    asks for it."""
    from ..solver.inner import InnerCarry
    from ..solver.lbfgs import LBFGSState

    if spec.armijo:
        return mega_chunk_traced_armijo(
            spec, r, m, interpret, pscale, data, R, lbfgs, lam, sigma,
            cur_gtol, stag_tol, max_steps,
        )

    dtype = R.dtype
    n_pad, rp, kk = spec.n_pad, spec.rp, spec.k

    Rt = jnp.zeros((rp, n_pad), dtype).at[:r].set(R.T)
    lam_ext = jnp.concatenate([lam, jnp.zeros((1,), dtype)])
    lam_row = jnp.take(lam_ext, data.cid_dev).reshape(1, n_pad)

    # (k, n_pad, r) <-> (k*rp, n_pad): transposed + rank-padded
    def to_kern(h):
        ht = jnp.swapaxes(h, 1, 2)                   # (k, r, n)
        ht = jnp.zeros((kk, rp, n_pad), dtype).at[:, :r].set(ht)
        return ht.reshape(kk * rp, n_pad)

    def from_kern(h2):
        ht = h2.reshape(kk, rp, n_pad)[:, :r]
        return jnp.swapaxes(ht, 1, 2)                # (k, n, r)

    lr_gid_cons = [g for t, g in enumerate(spec.lr_gids)
                   if not spec.lr_is_obj[t]]
    scal = jnp.concatenate([
        jnp.stack([
            jnp.asarray(sigma, dtype),
            jnp.asarray(cur_gtol, dtype),
            jnp.asarray(stag_tol, dtype),
            jnp.asarray(max_steps, dtype),
            lbfgs.head.astype(dtype),
        ]),
        lbfgs.rho.astype(dtype),
        (jnp.stack([lam[g] for g in lr_gid_cons]) if lr_gid_cons
         else jnp.zeros((0,), dtype)),
        data.b_lr.astype(dtype),
    ])

    (Rt_o, G_o, vio_o, s_o, y_o, osc) = _call_kernel(
        spec, interpret, dtype, scal, data.C, Rt, lam_row,
        data.w_row, data.b_row,
        to_kern(lbfgs.s_hist), to_kern(lbfgs.y_hist), data.lr_args,
    )

    R_new = Rt_o[:r].T
    G_new = G_o[:r].T
    obj = osc[1]
    vio_raw = jnp.zeros((m + 1,), dtype)
    vio_raw = vio_raw.at[data.cid_dev].set(vio_o[0])
    for i, g in enumerate(lr_gid_cons):
        vio_raw = vio_raw.at[g].set(osc[7 + kk + i])
    vio_raw = vio_raw.at[m].set(obj)

    lam_t = jnp.minimum(data.lam_ub, lam - sigma * vio_raw[:m])
    y_full = jnp.concatenate([-lam_t, jnp.ones((1,), dtype)])

    new_lbfgs = LBFGSState(
        s_hist=from_kern(s_o),
        y_hist=from_kern(y_o),
        rho=osc[7:7 + kk],
        head=osc[6].astype(jnp.int32),
        sty=jnp.zeros((kk, kk), dtype),
        yty=jnp.zeros((kk, kk), dtype),
    )
    carry = InnerCarry(
        R=R_new, G=G_new, y_full=y_full, vio_raw=vio_raw,
        L_val=osc[0], grad_norm=osc[2],
        lbfgs=new_lbfgs,
        steps=osc[3].astype(jnp.int32),
        stagnated=osc[4] > 0,
    )
    vio = jnp.maximum(vio_raw[:m], data.vio_lb)
    vio_norm = jnp.linalg.norm(vio) / pscale
    return carry, vio_norm


@functools.lru_cache(maxsize=None)
def _jitted_chunk(spec: MegaSpec, r: int, m: int, interpret: bool,
                  pscale: float):
    """Module-level cache: one compiled program per (spec, r, m) — reused
    across chunk calls AND across solves of the same shapes (a per-solve
    closure would re-trace the Pallas program every solve)."""
    return jax.jit(
        functools.partial(mega_chunk_traced, spec, r, m, interpret, pscale)
    )


def make_mega_inner_chunk(dp: DeviceProblem, *, k: int,
                          gtol_relative: bool, ptol_relative: bool,
                          interpret: bool | None = None):
    """Build factory: rank -> inner_chunk-compatible callable backed by
    the megakernel.

    The returned ``build_run(r)`` yields
      run(R, lbfgs, lam, sigma, cur_gtol, stag_tol, max_steps)
        -> (InnerCarry, vio_norm)
    matching solver/inner.py inner_chunk's outputs. G/y_full/vio_raw/L
    inputs of the XLA path are unnecessary — the kernel recomputes them
    from R on entry (one extra matmul per chunk), which also resets any
    f32 drift in the algebraically-maintained quantities.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    meta, data = prepare_mega_data(
        dp, k=k, gtol_relative=gtol_relative, ptol_relative=ptol_relative
    )

    def build_run(r: int):
        spec = mega_spec_for(meta, r)
        jitted = _jitted_chunk(
            spec, r, meta["m"], bool(interpret), meta["pscale"]
        )

        def run(R, lbfgs, lam, sigma, cur_gtol, stag_tol, max_steps):
            return jitted(data, R, lbfgs, lam, sigma, cur_gtol, stag_tol,
                          max_steps)

        return run

    return build_run
