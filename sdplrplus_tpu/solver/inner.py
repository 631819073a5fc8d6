"""The jitted inner L-BFGS loop — the hot loop of the solver.

TPU-native re-design of the reference's inner loop
(reference: src/sdplr.jl:190-278). The reference iterates on the host,
one BLAS call at a time; here an entire chunk of inner iterations runs
as ONE compiled lax.while_loop on device: direction (two-loop recursion),
descent-direction fallback, line search (exact quartic or Armijo), the
step, the gradient, norms, the fprec stagnation test, and the L-BFGS
ring-buffer update. The host only syncs once per chunk to check
wall-clock time and print progress.

Exit conditions inside the loop: grad_norm <= cur_gtol (converged),
stagnation (rel ΔL < stag_tol, reference: src/sdplr.jl:236-241), or the
chunk's step budget. The L-BFGS update is skipped on the stagnation exit,
exactly like the reference (update happens after the break there).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.adjoint import gradient, gradient_cx
from ..ops.device import DeviceProblem, fast_diag_eligible
from ..ops.forward import A_linesearch_cd, _full
from ..ops.spmm import spmm_C
from .al import capped_vio
from .lbfgs import LBFGSState, lbfgs_direction, lbfgs_push
from .linesearch import (
    armijo_from_products,
    armijo_linesearch,
    exact_from_products,
    exact_linesearch,
)


class InnerCarry(NamedTuple):
    R: jax.Array
    G: jax.Array
    y_full: jax.Array
    vio_raw: jax.Array
    L_val: jax.Array
    grad_norm: jax.Array
    lbfgs: LBFGSState
    steps: jax.Array      # steps taken this chunk
    stagnated: jax.Array  # bool
    # fast-diagonal path only: the carried sparse-C product CX = C_sparse@R
    # (ops/spmm.py design note). None on every other engine/path.
    CX: Any = None


def inner_step(
    dp: DeviceProblem,
    c: InnerCarry,
    lam,
    sigma,
    stag_tol,
    *,
    k: int,
    use_armijo: bool,
    gtol_relative: bool,
    lbfgs_compact: bool = True,
    use_cx: bool = False,
) -> InnerCarry:
    """One inner L-BFGS iteration (reference: src/sdplr.jl:196-246).

    λ/σ are explicit arguments (not closed over) so the fused outer driver
    (solver/major.py) can carry them through the same step function.

    ``use_cx`` selects the fast-diagonal engine: ONE SpMM (CD = C_sparse@D)
    per iteration feeds both line-search products, and the gradient comes
    from the carried recurrence CX ← CX + α·CD with zero further gathers
    (refreshed exactly at major boundaries, where the reference re-syncs
    state anyway — src/sdplr.jl:389)."""
    axis = dp.spmd_axis
    gscale = dp.normC if gtol_relative else 1.0

    # direction + descent fallback (reference: src/sdplr.jl:196-205)
    with jax.named_scope("lbfgs_direction"):
        direction = lbfgs_direction(
            c.lbfgs, c.G, k, spmd_axis=axis, compact=lbfgs_compact
        )
        descent = jnp.vdot(direction, c.G)
        if axis is not None:
            descent = lax.psum(descent, axis)
        bad = jnp.logical_or(jnp.isnan(descent), descent >= 0.0)
        direction = jnp.where(bad, -c.G, direction)

    if use_cx:
        # --- fast-diagonal engine: the iteration's single gather pass ----
        with jax.named_scope("spmm_CD"):
            CD = spmm_C(dp, direction)
        with jax.named_scope("linesearch"):
            A_RD, A_DD = A_linesearch_cd(dp, c.R, direction, CD)
            if use_armijo:
                alpha, L_new, vio_new = armijo_from_products(
                    dp, A_RD, A_DD, c.vio_raw, lam, sigma, c.y_full
                )
            else:
                alpha, L_new, vio_new = exact_from_products(
                    dp, A_RD, A_DD, c.vio_raw, lam, sigma
                )
        with jax.named_scope("gradient"):
            R_new = c.R + alpha * direction
            CX_new = c.CX + alpha * CD
            G_new, y_new = gradient_cx(dp, R_new, CX_new, lam, sigma, vio_new)
            gsq = jnp.sum(G_new * G_new)
            if axis is not None:
                gsq = lax.psum(gsq, axis)
            gnorm = jnp.sqrt(gsq) / gscale
    else:
        CX_new = c.CX
        # line search (reference: src/sdplr.jl:210-215)
        with jax.named_scope("linesearch"):
            if use_armijo:
                alpha, L_new, vio_new = armijo_linesearch(
                    dp, c.R, direction, c.vio_raw, lam, sigma, c.y_full
                )
            else:
                alpha, L_new, vio_new = exact_linesearch(
                    dp, c.R, direction, c.vio_raw, lam, sigma
                )

        # step + gradient (reference: src/sdplr.jl:219-223)
        with jax.named_scope("gradient"):
            R_new = c.R + alpha * direction
            G_new, y_new, _ = gradient(dp, R_new, lam, sigma, vio_new)
            gsq = jnp.sum(G_new * G_new)
            if axis is not None:
                gsq = lax.psum(gsq, axis)
            gnorm = jnp.sqrt(gsq) / gscale

    # fprec stagnation (reference: src/sdplr.jl:236-241)
    rel_delta = (c.L_val - L_new) / jnp.maximum(
        1.0, jnp.maximum(jnp.abs(L_new), jnp.abs(c.L_val))
    )
    stagnated = rel_delta < stag_tol

    # L-BFGS update, skipped on the stagnation exit
    if k > 0:
        pushed = lbfgs_push(
            c.lbfgs, alpha, direction, c.G, G_new, k, spmd_axis=axis
        )
        new_lbfgs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stagnated, a, b), c.lbfgs, pushed
        )
    else:
        new_lbfgs = c.lbfgs

    return InnerCarry(
        R=R_new,
        G=G_new,
        y_full=y_new,
        vio_raw=vio_new,
        L_val=L_new,
        grad_norm=gnorm,
        lbfgs=new_lbfgs,
        steps=c.steps + 1,
        stagnated=stagnated,
        CX=CX_new,
    )


def inner_chunk_impl(
    dp: DeviceProblem,
    R,
    G,
    y_full,
    vio_raw,
    L_val,
    grad_norm,
    lbfgs: LBFGSState,
    lam,
    sigma,
    cur_gtol,
    stag_tol,
    max_steps,
    *,
    k: int,
    use_armijo: bool,
    gtol_relative: bool,
    ptol_relative: bool,
    lbfgs_compact: bool = True,
):
    """Run up to ``max_steps`` inner iterations on device.

    Returns (carry, vio_norm).
    """
    pscale = dp.normb if ptol_relative else 1.0
    use_cx = fast_diag_eligible(dp)

    def cond(c: InnerCarry):
        return jnp.logical_and(
            c.grad_norm > cur_gtol,
            jnp.logical_and(c.steps < max_steps, jnp.logical_not(c.stagnated)),
        )

    def body(c: InnerCarry) -> InnerCarry:
        return inner_step(
            dp, c, lam, sigma, stag_tol,
            k=k, use_armijo=use_armijo, gtol_relative=gtol_relative,
            lbfgs_compact=lbfgs_compact, use_cx=use_cx,
        )

    init = InnerCarry(
        R=R,
        G=G,
        y_full=y_full,
        vio_raw=vio_raw,
        L_val=L_val,
        grad_norm=grad_norm,
        lbfgs=lbfgs,
        steps=jnp.zeros((), jnp.int32),
        stagnated=jnp.zeros((), bool),
        CX=spmm_C(dp, R) if use_cx else None,
    )
    out = lax.while_loop(cond, body, init)
    vio_norm = jnp.linalg.norm(capped_vio(dp, out.vio_raw)) / pscale
    return out, vio_norm


inner_chunk = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "use_armijo", "gtol_relative", "ptol_relative", "lbfgs_compact"
    ),
)(inner_chunk_impl)
