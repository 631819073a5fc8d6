"""Inner L-BFGS loop in entrywise dense-mask form (ops/entrymask.py).

Same state machine as solver/inner.py (reference: src/sdplr.jl:190-278)
but the loop carry holds violations as a dense masked (n_pad, n_pad)
matrix instead of the m-vector, so every iteration is MXU matmuls +
masked VPU reductions — no per-constraint gathers. The m-vector is
materialized only at the chunk boundary (entry_split / entry_merge), and
the chunk presents the standard InnerCarry interface so both drivers
(solver/outer.py host loop and solver/major.py fused state machine) plug
it in exactly like the Pallas megakernel path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.device import DeviceProblem
from ..ops.entrymask import (
    apply_C_entry,
    entry_lam,
    entry_merge,
    entry_split,
    gradient_entry,
    linesearch_entry,
    vio_norm_entry,
)
from .inner import InnerCarry
from .lbfgs import LBFGSState, lbfgs_direction, lbfgs_push


class EntryCarry(NamedTuple):
    R: jax.Array
    G: jax.Array
    CR: jax.Array       # C @ R, maintained incrementally (CR += α·CD)
    v_ew: jax.Array     # (n_pad, n_pad) masked violations
    v_ex: jax.Array     # (n_ex,) wide/low-rank constraint violations
    obj: jax.Array      # ⟨C, RRᵀ⟩
    L_val: jax.Array
    grad_norm: jax.Array
    lbfgs: LBFGSState
    steps: jax.Array
    stagnated: jax.Array


def entry_step(dp: DeviceProblem, c: EntryCarry, Lam_ew, lam_ex, sigma,
               stag_tol, *, k: int, gtol_relative: bool,
               lbfgs_compact: bool) -> EntryCarry:
    """One inner iteration (reference: src/sdplr.jl:196-246), all state in
    dense-mask form."""
    gscale = dp.normC if gtol_relative else 1.0
    axis = dp.spmd_axis

    direction = lbfgs_direction(
        c.lbfgs, c.G, k, spmd_axis=axis, compact=lbfgs_compact
    )
    descent = jnp.vdot(direction, c.G)
    if axis is not None:
        descent = lax.psum(descent, axis)
    bad = jnp.logical_or(jnp.isnan(descent), descent >= 0.0)
    direction = jnp.where(bad, -c.G, direction)

    ls = linesearch_entry(
        dp, c.R, direction, c.v_ew, c.v_ex, c.obj, Lam_ew, lam_ex, sigma
    )

    R_new = c.R + ls.alpha * direction
    CR_new = c.CR + ls.alpha * ls.CD
    G_new = gradient_entry(
        dp, R_new, CR_new, ls.v_ew, ls.v_ex, Lam_ew, lam_ex, sigma
    )
    gsq = jnp.sum(G_new * G_new)
    if axis is not None:
        gsq = lax.psum(gsq, axis)
    gnorm = jnp.sqrt(gsq) / gscale

    rel_delta = (c.L_val - ls.L_new) / jnp.maximum(
        1.0, jnp.maximum(jnp.abs(ls.L_new), jnp.abs(c.L_val))
    )
    stagnated = rel_delta < stag_tol

    if k > 0:
        pushed = lbfgs_push(
            c.lbfgs, ls.alpha, direction, c.G, G_new, k, spmd_axis=axis
        )
        new_lbfgs = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stagnated, a, b), c.lbfgs, pushed
        )
    else:
        new_lbfgs = c.lbfgs

    return EntryCarry(
        R=R_new, G=G_new, CR=CR_new, v_ew=ls.v_ew, v_ex=ls.v_ex, obj=ls.obj,
        L_val=ls.L_new, grad_norm=gnorm, lbfgs=new_lbfgs,
        steps=c.steps + 1, stagnated=stagnated,
    )


def entry_chunk_traced(
    dp: DeviceProblem,
    R, G, vio_raw, L_val, grad_norm,
    lbfgs: LBFGSState,
    lam, sigma, cur_gtol, stag_tol, max_steps,
    *,
    k: int,
    gtol_relative: bool,
    ptol_relative: bool,
    lbfgs_compact: bool = True,
):
    """Run up to ``max_steps`` entry-mode inner iterations.

    m-vector in, m-vector out: converts at the boundary and returns the
    standard (InnerCarry, vio_norm) pair so callers are representation-
    agnostic.
    """
    pscale = dp.normb if ptol_relative else 1.0

    v_ew, v_ex, obj = entry_split(dp, vio_raw)
    Lam_ew, lam_ex = entry_lam(dp, lam)
    CR = apply_C_entry(dp, R)

    def cond(c: EntryCarry):
        return jnp.logical_and(
            c.grad_norm > cur_gtol,
            jnp.logical_and(c.steps < max_steps, jnp.logical_not(c.stagnated)),
        )

    def body(c: EntryCarry) -> EntryCarry:
        return entry_step(
            dp, c, Lam_ew, lam_ex, sigma, stag_tol,
            k=k, gtol_relative=gtol_relative, lbfgs_compact=lbfgs_compact,
        )

    init = EntryCarry(
        R=R, G=G, CR=CR, v_ew=v_ew, v_ex=v_ex, obj=obj, L_val=L_val,
        grad_norm=jnp.asarray(grad_norm, R.dtype),
        lbfgs=lbfgs, steps=jnp.zeros((), jnp.int32),
        stagnated=jnp.zeros((), bool),
    )
    out = lax.while_loop(cond, body, init)

    vio_new = entry_merge(dp, out.v_ew, out.v_ex, out.obj)
    y_head = -jnp.minimum(dp.lam_ub, lam - sigma * vio_new[: dp.m])
    y_full = jnp.concatenate([y_head, jnp.ones((1,), dtype=R.dtype)])
    ic = InnerCarry(
        R=out.R, G=out.G, y_full=y_full, vio_raw=vio_new, L_val=out.L_val,
        grad_norm=out.grad_norm, lbfgs=out.lbfgs, steps=out.steps,
        stagnated=out.stagnated,
    )
    vio_norm = vio_norm_entry(dp, out.v_ew, out.v_ex, pscale)
    return ic, vio_norm


entry_chunk = functools.partial(
    jax.jit,
    static_argnames=("k", "gtol_relative", "ptol_relative", "lbfgs_compact"),
)(entry_chunk_traced)
