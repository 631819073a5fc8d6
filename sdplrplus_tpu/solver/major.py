"""Fused on-device outer driver: many major AL iterations per dispatch.

The host-driven outer loop (solver/outer.py, reference: src/sdplr.jl:185-393)
costs ~3+ device dispatches per major iteration (inner chunk, dual bound,
dual ascent, re-sync). Over the TPU tunnel each dispatch is ~100-200 ms of
RTT, which dominates wall-clock once the per-iteration device work is small.
This module fuses the ENTIRE major-iteration state machine into one
lax.while_loop so a single dispatch advances the solve by a full step
budget, crossing as many major-iteration boundaries as it reaches:

  * inner L-BFGS steps (solver/inner.inner_step),
  * the feasibility branch: vio ≤ cur_ptol → Lanczos dual bound with the
    device Sturm tridiagonal eigensolver (ops/lanczos.tridiag_min_eig_device)
    + best-λ/gap tracking + dual ascent + tolerance tightening
    (reference: src/sdplr.jl:310-364),
  * the infeasible branch: σ·=σfac, tolerance reset (src/sdplr.jl:365-370),
  * rank-doubling counter → exits to the host, which re-specializes shapes
    (src/sdplr.jl:372-386),
  * L-BFGS clear + fg! re-sync at the boundary (src/sdplr.jl:389).

The host keeps only: wall-clock limits, progress printing, checkpointing,
and rank doubling (a shape change). Each body step is a two-way lax.cond —
either one inner step or one major-boundary update — so resuming
mid-inner-loop across dispatches is free.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.adjoint import assemble_s_tri
from ..ops.device import DeviceProblem, fast_diag_eligible
from ..ops.forward import _psum
from ..ops.lanczos import (
    lanczos_alpha_beta_impl,
    lanczos_alpha_beta_reorth_impl,
    tridiag_min_eig_device,
    tridiag_min_eig_device_certified,
)
from .al import al_value_grad, al_value_grad_cx, capped_vio
from .inner import InnerCarry, inner_step
from .lbfgs import lbfgs_clear

BIG = 1e20


class MajorCarry(NamedTuple):
    ic: InnerCarry        # R, G, y_full, vio_raw, L_val, grad_norm, lbfgs,
                          # steps (inner steps this dispatch), stagnated
    lam: jax.Array        # (m,)
    sigma: jax.Array      # scalar
    cur_ptol: jax.Array   # scalar
    cur_gtol: jax.Array   # scalar
    key: jax.Array        # PRNG key for the Lanczos start vector
    best_lam: jax.Array   # (m,) λ at the best dual value
    max_dual: jax.Array   # scalar
    min_gap: jax.Array    # scalar
    last_gap: jax.Array   # scalar: duality gap at the last feasible boundary
    rankupd_cnt: jax.Array  # int32 countdown to rank doubling
    majoriters: jax.Array   # int32 major boundaries crossed this dispatch
    converged: jax.Array    # bool
    rank_double: jax.Array  # bool
    feas_count: jax.Array   # int32 feasible boundaries (dual bounds computed)
    dual_passes: jax.Array  # int32 operator passes spent on dual bounds
    #                         (MEASURED — feeds the dual-time attribution)


def _vio_norm(dp: DeviceProblem, vio_raw, pscale):
    # vio_raw is an m-vector, replicated under shard_map — no psum
    v = capped_vio(dp, vio_raw)
    return jnp.linalg.norm(v) / pscale


def major_chunk_impl(
    dp: DeviceProblem,
    carry: MajorCarry,
    budget,          # int32: inner-step budget this dispatch
    major_budget,    # int32: remaining major iterations (maxmajoriter guard)
    base_iter,       # int32: total inner iterations before this dispatch
    stag_tol,
    ptol_final,
    gtol_final,
    objtol,
    sigmafac,
    trace_bound,
    rankupd_tol,     # int32
    mega_data=0,     # ops/megakernel.MegaData when mega_spec is set
    *,
    k: int,
    use_armijo: bool,
    gtol_relative: bool,
    ptol_relative: bool,
    objtol_relative: bool,
    q_max: int,
    highprecision: bool,
    dual_safeguard: bool = True,
    lbfgs_compact: bool = True,
    blk_b: int = 0,       # block-Lanczos dual bound (ops/blocklanczos.py):
    blk_kmax: int = 0,    # block size / max block steps; 0 = scalar path
    blk_margin_frac: float = 0.25,  # stop when tb·margin ≤ frac·objtol·|obj|
    blk_k_min: int = 4,   # minimum Krylov depth (block steps)
    mega_spec=None,       # static ops/megakernel.MegaSpec: inner loop runs
    mega_r: int = 0,      # as ONE Pallas megakernel call per activation
    mega_interpret: bool = False,
):
    """Advance the solve by up to ``budget`` inner steps / ``major_budget``
    major boundaries on device. Returns the updated MajorCarry."""
    dtype = carry.ic.R.dtype
    m = dp.m
    pscale = dp.normb if ptol_relative else 1.0
    logn = jnp.log(jnp.asarray(max(dp.n, 2), dtype))
    # fast-diagonal engine (solver/inner.py use_cx): only for the plain
    # inner_step engine — the megakernel and entry engines carry CX=None
    use_cx = (
        mega_spec is None
        and getattr(dp, "ew_c2", None) is None
        and fast_diag_eligible(dp)
    )

    def cond(c: MajorCarry):
        # the finite-state guard stops the device loop on a numerically
        # failed state (NaN L or σ overflow) instead of spinning the
        # infeasible branch to the major limit: a NaN violation never
        # satisfies vio ≤ cur_ptol, so σ would double until inf
        healthy = jnp.isfinite(c.ic.L_val) & jnp.isfinite(c.sigma) & (
            c.sigma < jnp.asarray(2.0, dtype) ** 100
        )
        return (
            jnp.logical_not(c.converged)
            & jnp.logical_not(c.rank_double)
            & (c.ic.steps < budget)
            & (c.majoriters < major_budget)
            & healthy
        )

    if mega_spec is not None:
        # the whole inner loop as one Pallas megakernel call: it exits on
        # gnorm <= cur_gtol, stagnation, or the remaining step budget
        from ..ops.megakernel import mega_chunk_traced

        def inner_branch(c: MajorCarry) -> MajorCarry:
            remaining = jnp.maximum(budget - c.ic.steps, 0)
            ic2, _ = mega_chunk_traced(
                mega_spec, mega_r, m, mega_interpret, pscale, mega_data,
                c.ic.R, c.ic.lbfgs, c.lam, c.sigma, c.cur_gtol, stag_tol,
                remaining,
            )
            ic2 = ic2._replace(steps=c.ic.steps + ic2.steps)
            return c._replace(ic=ic2)
    elif getattr(dp, "ew_c2", None) is not None:
        # entrywise dense-mask inner loop (ops/entrymask.py): one
        # activation runs a whole inner sub-loop in dense-mask form;
        # m-vector conversions happen only at this boundary
        from .inner_entry import entry_chunk_traced

        def inner_branch(c: MajorCarry) -> MajorCarry:
            remaining = jnp.maximum(budget - c.ic.steps, 0)
            ic2, _ = entry_chunk_traced(
                dp, c.ic.R, c.ic.G, c.ic.vio_raw, c.ic.L_val,
                c.ic.grad_norm, c.ic.lbfgs, c.lam, c.sigma, c.cur_gtol,
                stag_tol, remaining,
                k=k, gtol_relative=gtol_relative,
                ptol_relative=ptol_relative, lbfgs_compact=lbfgs_compact,
            )
            ic2 = ic2._replace(steps=c.ic.steps + ic2.steps)
            return c._replace(ic=ic2)
    else:
        def inner_branch(c: MajorCarry) -> MajorCarry:
            ic2 = inner_step(
                dp, c.ic, c.lam, c.sigma, stag_tol,
                k=k, use_armijo=use_armijo, gtol_relative=gtol_relative,
                lbfgs_compact=lbfgs_compact, use_cx=use_cx,
            )
            return c._replace(ic=ic2)

    def _bound_for(c: MajorCarry, y_head, sub):
        """Safeguarded Lanczos dual value for one multiplier estimate
        (reference: src/coreop.jl:376-415), entirely on device via Sturm
        bisection for the tridiagonal eig. Returns (dual, passes) where
        ``passes`` is the number of operator applications spent."""
        y_full = jnp.concatenate([y_head, jnp.ones((1,), dtype=dtype)])
        S_dense = None
        if getattr(dp, "ew_c2", None) is not None:
            # entry mode: assemble S densely ONCE, matvecs become matmuls
            from ..ops.entrymask import assemble_S_dense

            s_tri = jnp.zeros((1,), dtype=dtype)
            S_dense = assemble_S_dense(dp, y_full)
        elif getattr(dp, "fn_apply_S", None) is not None or dp.all_cons_diagonal:
            s_tri = jnp.zeros((1,), dtype=dtype)
        else:
            s_tri = assemble_s_tri(dp, y_full)
        if blk_b > 0:
            # block-Lanczos path (ops/blocklanczos.py): R-seeded start
            # block, one b-lane operator pass per step, adaptive early
            # exit on the certified residual margin. Always safeguarded.
            from ..ops.blocklanczos import block_lanczos_min_eig_impl

            obj_now = jnp.abs(c.ic.vio_raw[m])
            denom_est = obj_now if objtol_relative else jnp.ones((), dtype)
            mt = (
                blk_margin_frac * objtol
                * jnp.maximum(denom_est, jnp.asarray(1e-8, dtype))
                / jnp.maximum(trace_bound, jnp.asarray(1.0, dtype))
            )
            theta, res_margin, k_used = block_lanczos_min_eig_impl(
                dp, s_tri, y_full, sub, c.ic.R, mt,
                jnp.asarray(blk_k_min, jnp.int32),
                b=blk_b, k_max=blk_kmax, S_dense=S_dense,
            )
            min_eig = theta - res_margin
            yb = jnp.dot(y_full[:m], dp.b)
            return -yb + trace_bound * jnp.minimum(min_eig, 0.0), k_used
        if highprecision:
            alpha, beta, k_eff = lanczos_alpha_beta_reorth_impl(
                dp, s_tri, y_full, sub, q_max=q_max, S_dense=S_dense
            )
        else:
            # q = 2⌈max(iter,100)^0.5·log n⌉ (reference: src/coreop.jl:402)
            it = jnp.maximum(base_iter + c.ic.steps, 100).astype(dtype)
            q = 2.0 * jnp.ceil(jnp.sqrt(it) * logn)
            q = jnp.clip(q, 1, min(q_max, dp.n)).astype(jnp.int32)
            alpha, beta, k_eff = lanczos_alpha_beta_impl(
                dp, s_tri, y_full, sub, q, q_max=q_max, S_dense=S_dense
            )
        if dual_safeguard:
            # residual-safeguarded λ_min estimate: θ_min − β_k·|s_k| − slack
            # so the dual value is a valid lower bound in practice and the
            # gap-based termination certificate cannot fire on an
            # unconverged eigensolve (round-1 negative-gap fix)
            theta, res_margin = tridiag_min_eig_device_certified(
                alpha, beta, k_eff
            )
            min_eig = theta - res_margin
        else:
            min_eig = tridiag_min_eig_device(alpha, beta, k_eff)
        yb = jnp.dot(y_full[:m], dp.b)
        return -yb + trace_bound * jnp.minimum(min_eig, 0.0), k_eff

    def dual_bound(c: MajorCarry, sub):
        """Dual value at the least-squares multiplier on LS-eligible
        (all-diagonal-constraint) families — the y minimizing ‖S(y)R‖_F
        with the equality/inequality split chosen to maximize −⟨y,b⟩
        (solver/dualbound.ls_dual_head; covers MaxCut/CutNorm identity
        diagonals, MinBisection's rank-1 coupling, and the μ-conductance
        inequality family) — or at the AL ascent iterate otherwise. The
        LS estimate certifies a far tighter bound than the AL λ − σv
        iterate, which carries O(σ·v) noise; any y is a valid dual (weak
        duality). ONE Lanczos either way, so the feasible-branch program
        stays the same size as the reference scheme
        (src/coreop.jl:376-415, which only evaluates the AL iterate)."""
        y_al = -jnp.minimum(
            dp.lam_ub, c.lam - c.sigma * c.ic.vio_raw[:m])
        if getattr(dp, "ew_c2", None) is not None:
            # entry mode (Lovász-θ family): masked-matrix CG multiplier
            from ..ops.entrymask import ls_dual_entry

            y_ls = ls_dual_entry(dp, c.ic.R)
        elif getattr(dp, "ls_eligible", False):
            from .dualbound import ls_dual_head

            CR = c.ic.CX if (use_cx and c.ic.CX is not None) else None
            y_ls = ls_dual_head(dp, c.ic.R, CR, y_fallback=y_al)
        else:
            d_al, p_al = _bound_for(c, y_al, sub)
            return d_al, p_al, y_al
        # alternate LS / AL multipliers across feasible boundaries: ONE
        # Lanczos per boundary (program stays reference-sized) while
        # max_dual accumulates the better of both estimates — the LS
        # bound dominates when the factor is near-stationary, the AL
        # bound when range(R) is blind to a dual direction (MinBisection
        # K₂'s 11ᵀ multiplier at a balanced factor)
        y = jax.tree_util.tree_map(
            lambda a, b: jnp.where(c.feas_count % 2 == 0, a, b), y_ls, y_al
        )
        d, p = _bound_for(c, y, sub)
        return d, p, y

    def feasible_branch(c: MajorCarry, vio_norm):
        """reference: src/sdplr.jl:310-364. The Lanczos dual bound only
        runs at STRICT boundaries (vio ≤ final ptol): at loose early
        boundaries the multiplier is far from dual-optimal and its bound
        essentially never survives the running max — while every bound
        costs q ≈ √iter·log n operator passes, which on the gather-bound
        engines at n ≥ 20k was ~80% of total wall time. (The reference
        computes a bound at every feasible boundary, src/sdplr.jl:310-321,
        but its rank-1 CPU SpMV is ~r× cheaper than its SpMM; on TPU both
        cost the same per pass, ops/spmm.py.)"""
        key, sub = jax.random.split(c.key)
        strict0 = vio_norm <= ptol_final

        def with_bound(c):
            dual, passes, y_head = dual_bound(c, sub)
            # `dual > max_dual` (not jnp.maximum) so a NaN dual — e.g. a
            # pathological multiplier state — never poisons the running best
            better = dual > c.max_dual
            return (
                jnp.where(better, -y_head, c.best_lam),
                jnp.where(better, dual, c.max_dual),
                c.feas_count + 1,
                _certified_obj(c),
                c.dual_passes + passes,
            )

        def skip_bound(c):
            return (c.best_lam, c.max_dual, c.feas_count, c.ic.vio_raw[m],
                    c.dual_passes)

        def _certified_obj(c):
            """Objective used in the termination gap. On identity-diagonal
            problems (diag(X) = b, b > 0) the raw iterate's objective can
            sit below the valid dual bound by its O(ptol) infeasibility,
            so the solve would terminate on a gap its final certificate
            (outer._feasible_obj, which reports the feasibility-PROJECTED
            objective) does not meet. Evaluate ⟨C, X̂⟩ at the exactly
            feasible projection R̂ᵢ = Rᵢ·√(bᵢ)/‖Rᵢ‖ instead — one extra
            operator pass per strict boundary — so the gap the solver
            terminates on IS the certificate it reports."""
            if getattr(dp, "entry_trace_cert", False):
                # entry-mode (Lovász-θ-family) termination objective:
                # the LINEAR-FEASIBLE value ⟨C, X̂−E⟩ = s·obj − ⟨C,E⟩,
                # where X̂ = s·RRᵀ satisfies the wide constraint exactly
                # (s = b_w/(b_w+v_w) ≥ 0 keeps PSD) and E zeroes the
                # entry violations exactly. X̂−E satisfies EVERY linear
                # constraint; it is only ε-PSD (λ_min ≥ −‖E‖). The fully
                # rigorous PSD repair (mix with I/n, charging
                # t = nδ/(1+nδ)) is reported by the host at the end
                # (outer._feasible_obj) but is NOT usable for
                # termination: at ptol = 1e-2 the deficit term is O(1)
                # for n ≥ 10³ (measured: a converged θ solve would need
                # per-entry violations ≲ objtol/n ~ 1e-6 to certify).
                # Terminating on the linear-feasible value is strictly
                # more conservative than the reference, which terminates
                # on the RAW objective (src/sdplr.jl:334-357).
                gid_w = dp.extra_gids[0]
                b_w = dp.b[gid_w]
                v_w = c.ic.vio_raw[gid_w]
                denom_w = b_w + v_w
                s = jnp.where(denom_w > 0, b_w / denom_w, 0.0)
                ve = c.ic.vio_raw[dp.entry_gids]
                cE = s * jnp.sum(dp.entry_csgn * ve)      # ⟨C, E⟩ exact
                # mix point X_I = c_mix·I, objective c_mix·trace(C)
                c_mix = jnp.asarray(dp.entry_mix_c, dtype)
                mix_obj = c_mix * jnp.asarray(dp.n * dp.trC_n, dtype)
                lin = s * c.ic.vio_raw[m] - cE
                # fully-rigorous PSD repair whenever affordable: mix
                # with X_I, charging t = δ/(δ + c_mix); use the mixed
                # value when its overhead fits in half the objtol
                # budget (always true at tight tolerances / small δ/c),
                # so converged tight solves certify rigorously and gaps
                # stay ≥ 0
                delta = s * jnp.sqrt(2.0 * jnp.sum(ve * ve))
                t_mix = delta / jnp.maximum(
                    delta + c_mix, jnp.finfo(dtype).tiny)
                mixed = (1.0 - t_mix) * lin + t_mix * mix_obj
                budget = 0.5 * objtol * (
                    jnp.maximum(jnp.abs(lin), jnp.asarray(1e-8, dtype))
                    if objtol_relative else jnp.ones((), dtype)
                )
                # charge the repair, capped at half the objtol budget:
                # = the fully rigorous mixed value when affordable; when
                # the structural δ/c blow-up makes it unaffordable, the
                # cap keeps termination reachable while still absorbing
                # the ε-PSD undershoot of the linear-feasible value
                val = jnp.minimum(mixed, lin + budget)
                return jnp.where(denom_w > 0, val, mix_obj)
            if not getattr(dp, "diag_identity", False):
                return c.ic.vio_raw[m]
            from ..ops.forward import _full
            from ..ops.spmm import spmm_C

            R = c.ic.R
            nrm2 = jnp.sum(R * R, axis=1)
            nloc = R.shape[0]
            off = 0
            if dp.spmd_axis is not None:
                off = lax.axis_index(dp.spmd_axis) * nloc
            rows = jnp.arange(nloc) + off
            b_row = jnp.where(rows < dp.n, dp.b[jnp.minimum(rows, m - 1)],
                              0.0)
            alive = nrm2 > 0
            scale = jnp.where(
                alive, jnp.sqrt(b_row / jnp.maximum(nrm2, 1e-30)), 0.0)
            Rhat = R * scale[:, None]
            CRh = spmm_C(dp, Rhat)
            hp = lambda a, bb: jnp.matmul(
                a, bb, precision=jax.lax.Precision.HIGHEST)
            for t in dp.lowrank:  # diag_identity ⇒ all low-rank terms are C
                BtR = hp(t.B.T, Rhat)
                if dp.spmd_axis is not None:
                    BtR = lax.psum(BtR, dp.spmd_axis)
                CRh = CRh + hp(t.B, t.d[:, None] * BtR)
            obj_cert = jnp.sum(CRh * Rhat)
            if dp.spmd_axis is not None:
                obj_cert = lax.psum(obj_cert, dp.spmd_axis)
            # dead rows make the projection infeasible — fall back to raw
            bad = jnp.any(jnp.where(rows < dp.n, ~alive, False))
            if dp.spmd_axis is not None:
                bad = lax.psum(bad.astype(jnp.int32), dp.spmd_axis) > 0
            return jnp.where(bad, c.ic.vio_raw[m], obj_cert)

        best_lam, max_dual, feas_count, obj, dual_passes = lax.cond(
            strict0, with_bound, skip_bound, c
        )
        if objtol_relative:
            denom = jnp.minimum(jnp.abs(obj), jnp.abs(max_dual))
            gap = jnp.where(denom > 0, (obj - max_dual) / denom, jnp.inf)
        else:
            gap = obj - max_dual

        strict = vio_norm <= ptol_final
        conv = strict & (gap <= objtol)
        # no-progress counter toward rank doubling (src/sdplr.jl:343-355)
        no_prog = (c.min_gap - gap) < objtol
        cnt = jnp.where(
            strict & jnp.logical_not(conv),
            jnp.where(no_prog, c.rankupd_cnt - 1, rankupd_tol),
            c.rankupd_cnt,
        )
        min_gap = jnp.where(strict & (gap < c.min_gap), gap, c.min_gap)
        rank_double = jnp.logical_and(cnt == 0, jnp.logical_not(conv))

        # dual ascent + tighten (skipped entirely on convergence/rank exit)
        live = jnp.logical_not(conv) & jnp.logical_not(rank_double)
        lam2 = jnp.where(
            live, jnp.minimum(dp.lam_ub, c.lam - c.sigma * c.ic.vio_raw[:m]),
            c.lam,
        )
        ptol2 = jnp.where(live, c.cur_ptol / c.sigma**0.9, c.cur_ptol)
        gtol2 = jnp.where(live, c.cur_gtol / c.sigma, c.cur_gtol)
        return c._replace(
            lam=lam2, cur_ptol=ptol2, cur_gtol=gtol2, key=key,
            best_lam=best_lam, max_dual=max_dual, min_gap=min_gap,
            last_gap=gap, rankupd_cnt=cnt, converged=conv,
            rank_double=rank_double,
            feas_count=feas_count, dual_passes=dual_passes,
        )

    def infeasible_branch(c: MajorCarry, vio_norm):
        """reference: src/sdplr.jl:365-370."""
        sigma2 = c.sigma * sigmafac
        return c._replace(
            sigma=sigma2,
            cur_ptol=1.0 / sigma2**jnp.asarray(0.1, dtype),
            cur_gtol=1.0 / sigma2,
        )

    def major_branch(c: MajorCarry) -> MajorCarry:
        vio_norm = _vio_norm(dp, c.ic.vio_raw, pscale)
        c = lax.cond(
            vio_norm <= c.cur_ptol, feasible_branch, infeasible_branch,
            c, vio_norm,
        )
        # tolerance floors (src/sdplr.jl:280-281 equivalent in outer.py)
        c = c._replace(
            cur_ptol=jnp.maximum(c.cur_ptol, ptol_final),
            cur_gtol=jnp.maximum(c.cur_gtol, gtol_final),
            majoriters=c.majoriters + 1,
        )

        def resync(c: MajorCarry) -> MajorCarry:
            # L-BFGS clear + fg! re-sync (src/sdplr.jl:383,389); on the
            # fast-diagonal engine this also refreshes the carried CX
            # recurrence from scratch (bounding its per-step drift to one
            # major iteration)
            if use_cx:
                L, vio_raw, G, y_full, gnorm, _, CX = al_value_grad_cx(
                    dp, c.ic.R, c.lam, c.sigma,
                    gtol_relative=gtol_relative, ptol_relative=ptol_relative,
                )
            else:
                L, vio_raw, G, y_full, gnorm, _ = al_value_grad(
                    dp, c.ic.R, c.lam, c.sigma,
                    gtol_relative=gtol_relative, ptol_relative=ptol_relative,
                )
                CX = None
            ic2 = InnerCarry(
                R=c.ic.R, G=G, y_full=y_full, vio_raw=vio_raw, L_val=L,
                grad_norm=gnorm, lbfgs=lbfgs_clear(c.ic.lbfgs),
                steps=c.ic.steps, stagnated=jnp.zeros((), bool), CX=CX,
            )
            return c._replace(ic=ic2)

        return lax.cond(
            jnp.logical_or(c.converged, c.rank_double), lambda c: c, resync, c
        )

    def body(c: MajorCarry) -> MajorCarry:
        inner_active = jnp.logical_and(
            c.ic.grad_norm > c.cur_gtol, jnp.logical_not(c.ic.stagnated)
        )
        return lax.cond(inner_active, inner_branch, major_branch, c)

    out = lax.while_loop(cond, body, carry)
    return out, _vio_norm(dp, out.ic.vio_raw, pscale)


major_chunk = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "use_armijo", "gtol_relative", "ptol_relative",
        "objtol_relative", "q_max", "highprecision", "dual_safeguard",
        "lbfgs_compact",
        "blk_b", "blk_kmax", "blk_margin_frac", "blk_k_min",
        "mega_spec", "mega_r", "mega_interpret",
    ),
)(major_chunk_impl)


@functools.partial(
    jax.jit,
    static_argnames=("rankupd_tol", "gtol_relative", "ptol_relative",
                     "with_cx"),
)
def init_major_carry(dp: DeviceProblem, R, lam, sigma, cur_ptol, cur_gtol,
                     key, lbfgs, rankupd_tol: int, *,
                     gtol_relative: bool, ptol_relative: bool,
                     with_cx: bool | None = None) -> MajorCarry:
    """Build the initial device carry from host state (fresh or post-rank-
    doubling). Runs one fg! to populate (L, vio, G). ``with_cx`` must match
    the engine selection of the major_chunk this carry feeds (True iff the
    plain inner_step engine runs on a fast-diagonal problem); None
    auto-detects for plain (non-megakernel) major_chunk calls.

    Jitted: over the remote-TPU tunnel the eager form costs one dispatch
    (plus a ~0.4 s per-op remote compile) for each of its ~50 ops."""
    dtype = R.dtype
    if with_cx is None:
        with_cx = (
            getattr(dp, "ew_c2", None) is None and fast_diag_eligible(dp)
        )
    if with_cx:
        L, vio_raw, G, y_full, gnorm, _, CX = al_value_grad_cx(
            dp, R, lam, sigma,
            gtol_relative=gtol_relative, ptol_relative=ptol_relative,
        )
    else:
        L, vio_raw, G, y_full, gnorm, _ = al_value_grad(
            dp, R, lam, sigma,
            gtol_relative=gtol_relative, ptol_relative=ptol_relative,
        )
        CX = None
    ic = InnerCarry(
        R=R, G=G, y_full=y_full, vio_raw=vio_raw, L_val=L, grad_norm=gnorm,
        lbfgs=lbfgs, steps=jnp.zeros((), jnp.int32),
        stagnated=jnp.zeros((), bool), CX=CX,
    )
    f = lambda x: jnp.asarray(x, dtype)
    return MajorCarry(
        ic=ic, lam=lam, sigma=f(sigma), cur_ptol=f(cur_ptol),
        cur_gtol=f(cur_gtol), key=key, best_lam=lam,
        max_dual=f(-BIG), min_gap=f(BIG), last_gap=f(BIG),
        rankupd_cnt=jnp.asarray(rankupd_tol, jnp.int32),
        majoriters=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool),
        rank_double=jnp.zeros((), bool),
        feas_count=jnp.zeros((), jnp.int32),
        dual_passes=jnp.zeros((), jnp.int32),
    )
