"""Outer augmented-Lagrangian driver and the public ``sdplr`` entry point.

TPU-native re-design of the reference's solver driver
(reference: src/sdplr.jl:91-449). The division of labor is the one SURVEY
§7 prescribes: the host holds (R, λ, σ, r, tolerances, timers) and drives
major iterations; each major iteration's inner L-BFGS loop runs as a
single compiled lax.while_loop on device (solver/inner.py), synced to the
host only once per ``config.inner_chunk`` steps for wall-clock checks and
progress printing. Rank doubling re-specializes the compiled programs for
the new (n, r) — bounded by log₂ of the Barvinok–Pataki rank.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import CompiledProblem, compile_problem
from ..config import SolverConfig, resolve_dtype
from ..ops.device import DeviceProblem, to_device
from ..problem import SDPProblem
from ..utils.printing import print_heading, print_intermediate
from .al import al_value_grad
from .dualbound import dimacs_errors, dual_obj
from .inner import inner_chunk
from .lbfgs import lbfgs_clear, lbfgs_init
from .rank import next_rank

_EPS64 = float(np.finfo(np.float64).eps)

_fg = jax.jit(
    al_value_grad, static_argnames=("gtol_relative", "ptol_relative")
)


@jax.jit
def _dual_ascent(dp: DeviceProblem, lam, sigma, vio_raw):
    """λᵢ ← min(λ_ub, λᵢ - σ vᵢ) (reference: src/sdplr.jl:358-361)."""
    return jnp.minimum(dp.lam_ub, lam - sigma * vio_raw[: dp.m])


def _init_vars(prob, dp, r: int,
               config: SolverConfig, dtype, rng: np.random.Generator):
    """Fresh (R0 padded, λ0) — random uniform(-1, 1) like the reference
    (src/structs.jl:237) or via a user init_func (src/structs.jl:231-234).

    init_func(problem, r, *init_args) must return (R0 [n, r], lam0 [m]);
    note the factor is n×r here (the reference passes/returns the r×n
    transpose — on TPU the n axis is the sharded leading axis)."""
    n, m = dp.n, dp.m
    if config.init_func is not None:
        R0, lam0 = config.init_func(prob, r, *config.init_args)
        R0 = np.asarray(R0, dtype=np.float64)
        if R0.shape == (r, n):
            R0 = R0.T
        if R0.shape != (n, r):
            raise ValueError(f"init_func returned R0 of shape {R0.shape}, want ({n},{r})")
        lam0 = np.minimum(
            np.asarray(lam0, dtype=np.float64).reshape(-1), np.asarray(dp.lam_ub)
        )
    else:
        R0 = rng.uniform(-1.0, 1.0, size=(n, r))
        lam0 = np.zeros(m)
    Rp = np.zeros((dp.n_pad, r))
    Rp[:n] = R0
    return jnp.asarray(Rp, dtype=dtype), jnp.asarray(lam0, dtype=dtype)


def _warm_vars(dp, R, r_new: int, rng: np.random.Generator, dtype):
    """Rank-doubling warm start: keep the current factor's columns and
    append small random columns (~1% of ‖R‖_F), so the solve resumes
    from the converged subspace and only learns the new directions.

    The reference restarts R from scratch on every rank update
    (src/coreop.jl:518-526, src/utils.jl:7-11); warm-starting is a
    deliberate improvement (config.rank_update_mode='restart' reproduces
    the reference behavior)."""
    n = dp.n
    R_old = np.asarray(R[:n], dtype=np.float64)
    r_old = R_old.shape[1]
    extra = rng.uniform(-1.0, 1.0, size=(n, r_new - r_old))
    nrm_extra = np.linalg.norm(extra)
    scale = 1e-2 * max(np.linalg.norm(R_old), 1.0) / max(nrm_extra, 1e-30)
    Rp = np.zeros((dp.n_pad, r_new))
    Rp[:n, :r_old] = R_old
    Rp[:n, r_old:] = scale * extra
    return jnp.asarray(Rp, dtype=dtype)


def _gtol_floor(config: SolverConfig, dtype) -> float:
    """Floor for the per-major stationarity tolerance.

    The reference tightens cur_gtol /= σ without bound
    (src/sdplr.jl:358-364); in float64 that is harmless, but in float32
    the schedule underflows to literally 0 after a few tens of feasible
    boundaries and the inner loop can then only exit through stagnation.
    Floor at a few ulps of the compute dtype (or the user's gtol)."""
    return max(config.gtol, 8.0 * float(jnp.finfo(jnp.dtype(dtype)).eps))


def _stagnation_tol(config: SolverConfig, dtype) -> float:
    """fprec·eps threshold (reference: src/sdplr.jl:239 uses Float64 eps).

    In float32 the f64-scaled threshold sits below the rounding noise
    floor; it is floored at a few f32 ulps so the inner loop cannot spin
    at the noise floor (unless fprec == 0, which disables the test)."""
    tol = config.fprec * _EPS64
    if config.fprec > 0 and jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        tol = max(tol, 4.0 * float(np.finfo(np.float32).eps))
    return tol


def _entry_term_obj(dp, vio_raw, objtol: float, objtol_relative: bool):
    """Host mirror of the fused driver's entry-mode termination
    objective (major._certified_obj): rigorous mixed certificate when
    its PSD-repair overhead fits half the objtol budget, else the
    linear-feasible value."""
    v = np.asarray(vio_raw, dtype=np.float64)
    gid_w = int(dp.extra_gids[0])
    b_w = float(np.asarray(dp.b)[gid_w])
    c_mix = float(dp.entry_mix_c)
    mix_obj = c_mix * dp.n * float(dp.trC_n)
    denom = b_w + v[gid_w]
    if denom <= 0:
        return mix_obj
    s = b_w / denom
    ve = v[np.asarray(dp.entry_gids)]
    cE = s * float(np.sum(np.asarray(dp.entry_csgn) * ve))
    lin = s * float(v[dp.m]) - cE
    delta = s * float(np.sqrt(2.0 * np.sum(ve * ve)))
    t_mix = delta / max(delta + c_mix, 1e-300)
    mixed = (1.0 - t_mix) * lin + t_mix * mix_obj
    budget = 0.5 * objtol * (max(abs(lin), 1e-8) if objtol_relative
                             else 1.0)
    return min(mixed, lin + budget)


def _greedy_is_objective(prob, dp, R_np: np.ndarray):
    """⟨C, χχᵀ⟩/|S| for a greedy independent set S of the entry-mode
    edge pattern, vertices tried in decreasing ‖R_i‖² (the factor's own
    weighting). A TRUE feasible objective for the θ family: entries are
    edges with b_e = 0 (compile gate), the wide/trace constraint holds
    by the 1/|S| scaling, and χχᵀ ⪰ 0. Analog of the reference's
    rounding callbacks (exps/test.jl:76-87) promoted to a certificate."""
    try:
        rows = np.asarray(dp.entry_rows)
        cols = np.asarray(dp.entry_cols)
        n = dp.n
        adj = [[] for _ in range(n)]
        for i, j in zip(rows.tolist(), cols.tolist()):
            if i < n and j < n and i != j:
                adj[i].append(j)
                adj[j].append(i)
        weights = np.sum(R_np * R_np, axis=1)
        order = np.argsort(-weights)
        chosen = np.zeros(n, dtype=bool)
        blocked = np.zeros(n, dtype=bool)
        for v in order:
            if blocked[v]:
                continue
            chosen[v] = True
            for u in adj[v]:
                blocked[u] = True
            blocked[v] = True
        S = np.nonzero(chosen)[0]
        if S.size == 0:
            return None
        chi = np.zeros(n)
        chi[S] = 1.0
        # scale χχᵀ to satisfy the wide constraint exactly:
        # X̃ = (b_w / Σ_{i∈S} w_i) · χχᵀ
        gid_w = int(dp.extra_gids[0])
        b_w = float(np.asarray(dp.b)[gid_w])
        w_row = np.asarray(dp.extra_wide_w)[0][:n]
        wS = float(np.sum(w_row[S]))
        if wS <= 0:
            return None
        from ..problem import SparseSym, SymLowRank

        C = prob.C
        if isinstance(C, SymLowRank):
            Bc = C.B.T @ chi
            val = float(np.sum(C.d * Bc * Bc))
        elif isinstance(C, SparseSym):
            val = float(np.sum(C.vals * chi[C.rows] * chi[C.cols]))
        else:
            return None
        return val * b_w / wS
    except Exception:
        return None


def _feasible_obj(prob, dp, R_np: np.ndarray, vio_raw=None):
    """⟨C, X̂⟩ for the feasibility-PROJECTED factor on identity-diagonal
    problems (diag(X) = b, b > 0): R̂ᵢ = Rᵢ·√bᵢ/‖Rᵢ‖ makes X̂ = R̂R̂ᵀ
    exactly feasible, so dual ≤ p* ≤ ⟨C, X̂⟩ is a clean two-sided
    certificate. The RAW objective of a slightly-infeasible iterate can
    legitimately sit a few ×10⁻⁴ BELOW the (valid) dual bound — reporting
    the projected value keeps rel_duality_gap ≥ 0 whenever the dual
    certificate itself is valid. None when no closed-form projection
    applies (non-diagonal constraint families)."""
    if getattr(dp, "entry_trace_cert", False) and vio_raw is not None:
        # entry-mode RIGOROUS feasible value: the better of
        #   (a) the PSD-repaired mix: zero the entry violations of
        #       X̂ = s·RRᵀ (exactly), then X̃ = (X̂−E+δI)/(1+nδ) with
        #       δ = ‖E‖_F ≥ ‖E‖₂ — feasible for every constraint, cost
        #       t = nδ/(1+nδ) of the distance to the I/n objective
        #       (structurally loose at ptol=1e-2 for n ≳ 10³),
        #   (b) greedy independent-set rounding: X̃ = χ_S χ_Sᵀ/|S| for an
        #       independent set S picked by R-row weight — exactly
        #       feasible (entries are edges with b_e = 0), and tight
        #       whenever the factor encodes the optimal support.
        # The fused driver terminates on the LINEAR-FEASIBLE value
        # instead (major._certified_obj — ε-PSD; reference semantics
        # terminate on the raw objective, src/sdplr.jl:334-357); this
        # rigorous value is what rel_duality_gap reports.
        v = np.asarray(vio_raw, dtype=np.float64)
        gid_w = int(dp.extra_gids[0])
        b_w = float(np.asarray(dp.b)[gid_w])
        c_mix = float(dp.entry_mix_c)
        mix_obj = c_mix * dp.n * float(dp.trC_n)
        denom = b_w + v[gid_w]
        if denom <= 0:
            cert = mix_obj  # the feasible point X_I itself
        else:
            s = b_w / denom
            ve = v[np.asarray(dp.entry_gids)]
            cE = s * float(np.sum(np.asarray(dp.entry_csgn) * ve))
            delta = s * float(np.sqrt(2.0 * np.sum(ve * ve)))
            t_mix = delta / max(delta + c_mix, 1e-300)
            cert = (1.0 - t_mix) * (s * float(v[dp.m]) - cE) \
                + t_mix * mix_obj

        rounded = _greedy_is_objective(prob, dp, R_np)
        if rounded is not None:
            cert = min(cert, rounded)
        return cert
    if not getattr(dp, "diag_identity", False):
        return None
    b = np.asarray(dp.b, dtype=np.float64)
    if b.shape[0] != R_np.shape[0] or np.any(b <= 0):
        return None
    norms_sq = np.sum(R_np * R_np, axis=1)
    if np.any(norms_sq <= 0) or not np.all(np.isfinite(norms_sq)):
        return None
    Rhat = R_np * np.sqrt(b / norms_sq)[:, None]
    total = 0.0
    C = prob.C
    from ..problem import SparseSym, SymLowRank

    if isinstance(C, SparseSym):
        total += float(
            np.sum(C.vals * np.sum(Rhat[C.rows] * Rhat[C.cols], axis=1))
        )
    elif isinstance(C, SymLowRank):
        BtR = C.B.T @ Rhat
        total += float(np.sum(C.d * np.sum(BtR * BtR, axis=1)))
    else:
        return None
    return total


def _want_block_lanczos(lanczos_block: int, highprecision: bool,
                        n: int, q_raw: int) -> bool:
    """Block-vs-scalar dual-bound path selection (see blk_for in
    _solve_fused). Block when: forced (lanczos_block > 0), n > 4096
    (the measured 54-57%-of-wall regime, VERDICT r4), or the scalar
    schedule wants q > 1024 — past the device Sturm eigensolver's safe
    bucket — so the scalar clamp never silently degrades a certificate.
    Scalar when forced (-1) or highprecision (reorthogonalized path).
    The escalation triggers on min(q_raw, n) — the depth the scalar
    path would ACTUALLY run — not the raw schedule: at n ≤ 1024 the
    scalar Krylov space is already full (q = n is exact) and a boosted
    schedule 'wanting' more is meaningless, while the block subspace
    (≤ 512 columns) is strictly smaller there (measured: θ G1 certified
    9.8e-3 on the full scalar space, 1.75e-2 on the block path)."""
    if lanczos_block < 0 or highprecision:
        return False
    return lanczos_block > 0 or n > 4096 or min(q_raw, n) > 1024


def _engine_name(dp, use_mega: bool) -> str:
    """Which inner-loop engine served this solve (result provenance)."""
    from ..ops.device import fast_diag_eligible

    if use_mega:
        return "pallas-megakernel"
    if getattr(dp, "ew_c2", None) is not None:
        return "entry-mask"
    if getattr(dp, "C_dense", None) is not None:
        return "dense-mxu"
    if fast_diag_eligible(dp):
        return "fast-diag-spmm"
    return "xla-general"


def _final_gap(obj: float, max_dual: float, have_dual) -> float:
    """Relative duality gap of the FINAL iterate against the best
    certified dual bound: (obj - d*)/min(|obj|, |d*|).

    This is the certificate the solve ends with. It differs from
    ``min_duality_gap`` (the reference's trajectory statistic,
    src/sdplr.jl:334-357): the trajectory min is taken over every
    feasibility boundary, including early loose-tolerance ones where the
    iterate is still far from feasible and its objective legitimately
    undershoots the dual bound — which makes the *minimum* negative even
    though every individual certificate is valid. Reporting artifact
    only; both values are returned."""
    if not have_dual:
        return float("inf")
    denom = min(abs(obj), abs(max_dual))
    return (obj - max_dual) / denom if denom > 0 else float("inf")


def sdplr(C, As, b, r: int, *, constraint_types=None,
          config: Optional[SolverConfig] = None, **kwargs) -> dict:
    """Solve min ⟨C,X⟩ s.t. ⟨Aᵢ,X⟩ =/≤ bᵢ, X ⪰ 0 via X = RRᵀ.

    The public entry point, mirroring the reference's only export
    (reference: src/sdplr.jl:91-138). Unknown keyword arguments raise,
    like the reference's kwarg→config merge (src/sdplr.jl:102-108).
    """
    cfg = (config or SolverConfig()).copy_with(**kwargs)
    prob = SDPProblem(C, list(As), np.asarray(b, dtype=np.float64), constraint_types)
    return solve(prob, r, cfg)


def _maybe_rescale_entry(prob: SDPProblem, config: SolverConfig):
    """Auto-conditioning for trace-normalized entry families (Lovász-θ:
    Tr X = 1, edge entries 0): solve the EQUIVALENT problem in
    X' = f·X with f = Σw/b_w (C' = C/f, b' = f·b — the objective value
    is invariant), so X' entries are O(1) instead of O(1/n).

    Measured failure this fixes: at n = 10³ the original scaling's
    per-step AL progress falls below f32 resolution — the inner loop
    'stagnates' after a handful of steps, every boundary fires the
    infeasible branch, and σ doubles to the overflow guard (f64 solves
    the same instance exactly). Returns (prob', config', f); f = 1.0
    means no rescale."""
    from ..problem import SparseSym, SymLowRank

    b = np.asarray(prob.b, dtype=np.float64)
    if prob.constraint_types is not None and np.any(prob.constraint_types):
        return prob, config, 1.0
    nz = np.nonzero(b)[0]
    if len(nz) != 1:
        return prob, config, 1.0
    gid_w = int(nz[0])
    A_w = prob.As[gid_w]
    if not isinstance(A_w, SparseSym):
        return prob, config, 1.0
    if not ((A_w.rows == A_w.cols).all() and (A_w.vals >= 0).all()):
        return prob, config, 1.0
    b_w = float(b[gid_w])
    w_sum = float(np.sum(A_w.vals))
    if b_w <= 0 or w_sum <= 0:
        return prob, config, 1.0
    f = w_sum / b_w
    if f < 64.0:
        return prob, config, 1.0
    C = prob.C
    if isinstance(C, SymLowRank):
        C2 = SymLowRank(C.B, C.d / f)
    elif isinstance(C, SparseSym):
        C2 = SparseSym(C.rows, C.cols, C.vals / f, C.n)
    else:
        return prob, config, 1.0
    prob2 = SDPProblem(C2, list(prob.As), b * f, prob.constraint_types)
    cfg2 = config.copy_with(
        prior_trace_bound=config.prior_trace_bound * f
        if np.isfinite(config.prior_trace_bound) else config.prior_trace_bound
    )
    return prob2, cfg2, f


def solve(prob: SDPProblem, r: int, config: SolverConfig,
          mesh=None) -> dict:
    """Solve ``prob``. With ``config.devices > 1`` (or an explicit
    ``mesh``) the fused outer driver runs under jax.shard_map over a 1-D
    device mesh: R / ELL rows / L-BFGS history row-sharded, constraint
    vectors replicated, scalar reductions and Lanczos recurrences psum'd
    (parallel/shardmap.py; SURVEY §5 sharding plan)."""
    if config.printlevel > 0:
        print_heading(True)

    prob, config, rescale_f = _maybe_rescale_entry(prob, config)

    t_pre = time.time()
    dtype = resolve_dtype(config)
    if mesh is None and int(config.devices) > 1:
        from ..parallel.spmd import make_mesh

        mesh = make_mesh(int(config.devices))
    if mesh is not None:
        import math

        from ..parallel.shardmap import shardmap_problem

        nd = int(np.prod(mesh.devices.shape))
        pad = 128 * nd // math.gcd(128, nd)
        cp = compile_problem(
            prob, dense=config.dense_mode, entry=config.entry_mode,
            n_shards=nd, row_pad=pad, nnz_pad=pad,
        )
        dp = to_device(cp, dtype)
        dp_spmd, specs = shardmap_problem(cp, dtype, mesh)
        spmd = (mesh, dp_spmd, specs)
    else:
        cp = compile_problem(
            prob, dense=config.dense_mode, entry=config.entry_mode
        )
        dp = to_device(cp, dtype)
        spmd = None
    preprocess_time = time.time() - t_pre

    if config.profile_dir is not None:
        with jax.profiler.trace(config.profile_dir):
            result = _solve(prob, dp, r, config, dtype, spmd)
    else:
        result = _solve(prob, dp, r, config, dtype, spmd)
    result["preprocess_time"] = preprocess_time
    result["totaltime"] += preprocess_time
    result["devices"] = 1 if spmd is None else int(np.prod(mesh.devices.shape))

    if rescale_f != 1.0:
        # map the solution back to the user's scale: X = X'/f so
        # R = R'/√f; duals y = f·y' (S = f·S'); objective/dual values
        # and relative norms are invariant by construction
        sf = float(np.sqrt(rescale_f))
        for key in ("R", "Rt", "R0", "Rt0"):
            if result.get(key) is not None:
                result[key] = np.asarray(result[key]) / sf
        for key in ("lambda", "lambda_last", "lambda0"):
            if result.get(key) is not None:
                result[key] = np.asarray(result[key]) * rescale_f
        result["entry_rescale_f"] = rescale_f

    if config.printlevel > 0:
        print_heading(False)
    return result


def _solve(prob, dp, r: int, config: SolverConfig, dtype,
           spmd=None) -> dict:
    if spmd is not None and not config.fused_outer:
        raise ValueError(
            "multi-device solves run through the fused outer driver; "
            "set fused_outer=True (the default) when devices > 1"
        )
    if not config.fused_outer:
        return _solve_host(prob, dp, r, config, dtype)

    result = _solve_fused(prob, dp, r, config, dtype, spmd)
    # reseed-restart: the last rung of the stall ladder. A BM trajectory
    # can land in a spurious basin (measured: μ-conductance G4 seed 0 on
    # the megakernel engine stalls at obj 0.767 / gap 15 with every
    # budget maxed, while seed 1 converges to 0.727 at gap 9.9e-3, and
    # the XLA engine converges seed 0 — basin luck, not a kernel bug).
    # When the ladder exhausted its budgets with a useless certificate
    # and wall-clock remains, retry from a fresh seed and keep the best
    # attempt. No reference counterpart (the reference grinds to its
    # time limit, src/sdplr.jl:298-306).
    def _gap_of(res):
        g = res.get("rel_duality_gap")
        return float("inf") if g is None or not np.isfinite(g) else float(g)

    attempts = 0
    spent = float(result["totaltime"])

    def _dual_polish(res):
        # host f64 dual polish: when the certificate misses the
        # protocol tolerance, the slack is in the dual MULTIPLIER, not
        # the eigensolve — any y certifies by weak duality, so
        # maximizing d(y) on the host in float64
        # (solver/dualrefine.refine_dual: lift S(y)'s bottom eigenband
        # by damped Gauss-Newton LSQR over the b=0 multipliers) can
        # only tighten the reported bound. The framework's analog of
        # the reference's eigval_highprecision escape
        # (src/coreop.jl:351-374), aimed one level deeper.
        # Equality-only (refine_dual's domain); cheap next to a reseed
        # (measured: 8 s vs a 30 s fresh basin on θ G1, closing
        # 1.04e-2 -> 8.9e-3).
        eq_only = (prob.constraint_types is None
                   or not bool(np.any(prob.constraint_types)))
        gap_now = _gap_of(res)
        if not (eq_only and np.isfinite(config.objtol)
                and config.objtol > 0
                and np.isfinite(gap_now) and gap_now > config.objtol
                and res.get("lambda") is not None
                and config.maxtime - float(res["totaltime"]) > 30.0):
            return res
        try:
            from .dualrefine import refine_dual

            t_ref = time.time()
            y0 = -np.asarray(res["lambda"], np.float64)
            y_ref, dual_ref, _, _hist = refine_dual(
                prob.C, prob.As, np.asarray(prob.b, np.float64), y0,
                float(config.prior_trace_bound), iters=6,
                k_eig=min(96, max(8, prob.n - 2)),
                verbose=config.printlevel > 1,
            )
            obj_c0 = res.get("obj_feasible")
            obj_c0 = (float(res["obj"]) if obj_c0 is None
                      else float(obj_c0))
            if (_final_gap(obj_c0, dual_ref, True) > config.objtol
                    and config.maxtime - float(res["totaltime"])
                    - (time.time() - t_ref) > 60.0):
                # escalate once: wider eigenband + deeper LSQR for the
                # stragglers the 6x96 pass leaves just above tolerance
                y2, d2, _, _ = refine_dual(
                    prob.C, prob.As, np.asarray(prob.b, np.float64),
                    y_ref, float(config.prior_trace_bound), iters=10,
                    k_eig=min(160, max(8, prob.n - 2)), lsqr_iters=300,
                    verbose=config.printlevel > 1,
                )
                if d2 > dual_ref:
                    y_ref, dual_ref = y2, d2
            obj_c = res.get("obj_feasible")
            obj_c = float(res["obj"]) if obj_c is None else float(obj_c)
            if dual_ref > float(res["max_dual_value"]):
                gap_ref = _final_gap(obj_c, dual_ref, True)
                res["max_dual_value"] = float(dual_ref)
                res["lambda"] = -y_ref
                res["rel_duality_gap"] = gap_ref
                res["min_duality_gap"] = min(
                    float(res["min_duality_gap"]), gap_ref)
                res["dual_refined"] = True
                if config.printlevel > 0:
                    print(f"host f64 dual polish: gap {gap_now:.3e} -> "
                          f"{gap_ref:.3e} "
                          f"({time.time() - t_ref:.1f} s)")
            res["dual_refine_time"] = time.time() - t_ref
            res["totaltime"] += res["dual_refine_time"]
        except Exception as e:  # pragma: no cover - best-effort
            res["dual_refine_error"] = f"{type(e).__name__}: {e}"
        return res

    result = _dual_polish(result)
    spent = float(result["totaltime"])
    # retry threshold: any certificate that MISSES the protocol
    # tolerance is worth a fresh basin while wall-clock remains —
    # stalled f32 trajectories scatter 1.0–2.7e-2 across seeds on the
    # θ family, and best-of costs only time the budget already allows
    while (attempts < 2
           and np.isfinite(config.objtol) and config.objtol > 0
           and not result.get("timed_out", False)
           and _gap_of(result) > config.objtol
           and config.maxtime - spent > max(60.0, 0.2 * spent)):
        attempts += 1
        cfg2 = config.copy_with(seed=config.seed + 1031 * attempts,
                                maxtime=config.maxtime - spent)
        if config.printlevel > 0:
            print(f"certificate unusable (gap {_gap_of(result):.3g}) with "
                  f"budgets exhausted; reseed-restart {attempts} "
                  f"(seed {cfg2.seed}).")
        res2 = _solve_fused(prob, dp, r, cfg2, dtype, spmd)
        spent += float(res2["totaltime"])
        if _gap_of(res2) < _gap_of(result):
            result = res2
        result["totaltime"] = spent
        result["reseed_attempts"] = attempts

    result = _dual_polish(result)
    return result


def _solve_fused(prob, dp, r: int, config: SolverConfig, dtype,
                 spmd=None) -> dict:
    """Fused driver: each dispatch runs up to ``inner_chunk`` inner steps AND
    every major-iteration boundary it crosses on device (solver/major.py).
    The host only checks wall-clock limits, prints, checkpoints, and
    re-specializes shapes on rank doubling."""
    from ..ops.lanczos import bucket_q_max, lanczos_q
    from .major import init_major_carry, major_chunk

    n, m = dp.n, dp.m
    rng = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)

    starttime = time.time()
    lastprint = starttime

    R, lam = _init_vars(prob, dp, r, config, dtype, rng)
    R0_np, lam0_np = np.asarray(R[:n]), np.asarray(lam)

    k = int(config.numlbfgsvecs)
    use_armijo = dp.has_inequalities
    gtol_rel = config.gtol_mode == "relative"
    ptol_rel = config.ptol_mode == "relative"
    objtol_rel = config.objtol_mode == "relative"
    stag_tol = _stagnation_tol(config, dtype)
    sigma0 = float(config.sigma0)

    # Pallas megakernel for the fused inner loop (ops/megakernel.py):
    # each activation of the inner loop runs as ONE in-VMEM kernel call
    from ..ops.megakernel import (
        mega_spec_for, megakernel_eligible, prepare_mega_data,
    )

    mega_meta = mega_data = None
    if config.inner_impl in ("auto", "mega") and spmd is None:
        eligible = megakernel_eligible(dp, r, k, use_armijo, dtype)
        if config.inner_impl == "auto" and jax.default_backend() != "tpu":
            eligible = False
        if eligible:
            mega_meta, mega_data = prepare_mega_data(
                dp, k=k, gtol_relative=gtol_rel, ptol_relative=ptol_rel
            )

    def blk_for(r_now: int, q_raw: int = 0) -> tuple:
        """(b, k_max) for the block-Lanczos dual bound, or (0, 0) for the
        scalar path. Auto: block for n > 4096, where the rank-1 Lanczos
        schedule was measured at 54-57% of total wall time (VERDICT r4);
        below that the projected small-eigensolve overhead rivals the
        SpMM passes and the scalar path keeps the tiny-problem tests'
        f64 exactness. A scalar-path request whose schedule wants
        q > 1024 (past the device Sturm eigensolver's safe bucket, see
        the ceiling note below) also escalates to the block path, whose
        projected subspace never exceeds 512 columns by construction —
        so the ceiling never silently degrades a certificate."""
        if not _want_block_lanczos(config.lanczos_block,
                                   config.eigval_highprecision, n, q_raw):
            return 0, 0
        from ..ops.blocklanczos import block_sizes

        return block_sizes(n, r_now, max(config.lanczos_block, 0))

    # shard_map runners for the SPMD path, cached per Lanczos bucket
    # (parallel/shardmap.py make_shardmap_major)
    spmd_runners: dict = {}

    def spmd_runner(q_max_now: int, blk, margin_frac: float, k_min: int):
        key_ = (q_max_now, blk, margin_frac, k_min)
        if key_ not in spmd_runners:
            from ..parallel.shardmap import make_shardmap_major

            mesh_, _, specs_ = spmd
            spmd_runners[key_] = make_shardmap_major(
                mesh_, specs_, k=k, use_armijo=use_armijo,
                q_max=q_max_now, gtol_relative=gtol_rel,
                ptol_relative=ptol_rel, objtol_relative=objtol_rel,
                highprecision=bool(config.eigval_highprecision),
                lbfgs_compact=config.lbfgs_impl == "compact",
                dual_safeguard=bool(config.dual_safeguard),
                blk_b=blk[0], blk_kmax=blk[1],
                blk_margin_frac=margin_frac, blk_k_min=k_min,
            )
        return spmd_runners[key_]

    def mega_kwargs(r_now: int):
        if mega_meta is None or not megakernel_eligible(
            dp, r_now, k, use_armijo, dtype
        ):
            return {}, 0
        return {
            "mega_spec": mega_spec_for(mega_meta, r_now),
            "mega_r": r_now,
            "mega_interpret": jax.default_backend() != "tpu",
        }, mega_data

    def cx_for(r_now: int) -> bool:
        # the carry must carry CX exactly when major_chunk will run the
        # fast-diagonal inner_step engine (solver/major.py use_cx)
        from ..ops.device import fast_diag_eligible

        mkw, _ = mega_kwargs(r_now)
        return (
            not mkw
            and getattr(dp, "ew_c2", None) is None
            and fast_diag_eligible(dp)
        )

    def fresh_carry(R, lam, key):
        return init_major_carry(
            dp, R, lam, sigma0,
            max(1.0 / sigma0**0.1, config.ptol),
            max(1.0 / sigma0, _gtol_floor(config, dtype)),
            key, lbfgs_init(k, dp.n_pad, r, dtype), config.rankupd_tol,
            gtol_relative=gtol_rel, ptol_relative=ptol_rel,
            with_cx=cx_for(r),
        )

    carry = fresh_carry(R, lam, key)
    base_total = 0   # inner steps completed before the current carry lifetime
    base_major = 0   # major boundaries completed before the current lifetime
    q_boost = 1      # Lanczos budget escalation once r hits the BP cap
    tried_polish = False       # one bounded stagnation-off attempt per rank
    saved_stag_tol = stag_tol  # restored if the polish doesn't converge
    polish_start = 0           # total_iter when the polish began
    POLISH_BUDGET = 1500       # inner steps a polish may spend; deadlock
    #                            stalls resolve in a few hundred steps —
    #                            past this, rank is the real blocker
    final_polish = False       # permanent stagnation-off at the ladder end
    timed_out = False
    vio_norm = float("inf")

    # adaptive per-dispatch step budget (see config.dispatch_target_s):
    # starts small, converges to target_s / measured-per-step-time. Small
    # problems (n_pad ≤ 4096) run full chunks from the start — their
    # per-step time is microseconds, far from the worker's execution
    # watchdog, and fragmenting dispatches just multiplies tunnel RTTs.
    adapt = config.dispatch_target_s > 0 and dp.n_pad > 4096
    chunk_now = min(config.inner_chunk, 250) if adapt else config.inner_chunk

    while True:
        steps_now = int(carry.ic.steps)
        majors_now = int(carry.majoriters)
        total_iter = base_total + steps_now
        majoriter = base_major + majors_now

        chunk = min(chunk_now, config.maxiter - total_iter + 1)
        major_thresh = config.maxmajoriter - base_major
        if chunk <= 0:
            print("Warning: iteration limit exceeded. Stop optimizing.")
            break
        if majors_now >= major_thresh:
            print("Warning: major iteration limit exceeded. Stop optimizing.")
            break

        q_raw = lanczos_q(total_iter + chunk, n) * q_boost
        if config.eigval_highprecision:
            q_raw = min(max(100, 2 * q_raw), n)
        blk = blk_for(r, q_raw)
        # 1024-iteration ceiling on the SCALAR path only: the device
        # tridiagonal eigensolve at a 2048 bucket reproducibly faults the
        # remote TPU worker, and a 1024-step unreorthogonalized f32
        # Lanczos is past its useful accuracy anyway. A scalar-path
        # schedule that wants more has already escalated to the block
        # path in blk_for (subspace ≤ 512 columns by construction,
        # ops/blocklanczos.block_sizes), so the clamp below only binds
        # for forced-scalar (lanczos_block=-1) and highprecision runs.
        q_need = min(q_raw, max(n, 1), 1024)
        q_max = bucket_q_max(q_need)
        # minimum Krylov depth ~ log2(n) (the degree-8 failure mode:
        # a plateaued θ at tiny margin before λ_min's eigenvector was
        # discovered at all); gap-stall escalation (q_boost) demands a
        # deeper minimum and a tighter margin before the exit may fire
        blk_margin_frac = 0.25 / q_boost
        k_min_base = max(4, int(np.ceil(np.log2(max(n, 2)))))
        blk_k_min = min(k_min_base * q_boost, blk[1]) if blk[0] else 4

        # cap major boundaries per dispatch too, sized to the boundary
        # cost: on the SCALAR dual path a strict boundary runs a
        # q-matvec Lanczos (~10 s at n=100k), so at most 2 fit inside
        # the worker's execution watchdog; the block path's boundary is
        # ~0.5 s (k_max b-lane passes + one projected eigensolve), so
        # forcing a host round-trip every 2 boundaries just multiplied
        # tunnel RTTs (measured: 28 of 35 SYN20K dispatches were
        # boundary-forced at ~0.2 s fixed overhead each)
        dispatch_majors = (
            min(major_thresh, majors_now + (8 if blk[0] else 2))
            if adapt else major_thresh
        )
        chunk_args = (
            jnp.asarray(steps_now + chunk, jnp.int32),
            jnp.asarray(dispatch_majors, jnp.int32),
            jnp.asarray(base_total, jnp.int32),
            jnp.asarray(stag_tol, dtype),
            jnp.asarray(config.ptol, dtype),
            jnp.asarray(_gtol_floor(config, dtype), dtype),
            jnp.asarray(config.objtol, dtype),
            jnp.asarray(config.sigmafac, dtype),
            jnp.asarray(config.prior_trace_bound, dtype),
            jnp.asarray(config.rankupd_tol, jnp.int32),
        )
        t_dispatch = time.time()
        if spmd is not None:
            carry, vio_norm_d = spmd_runner(
                q_max, blk, blk_margin_frac, blk_k_min
            )(spmd[1], carry, *chunk_args)
        else:
            mkw, mdata = mega_kwargs(r)
            carry, vio_norm_d = major_chunk(
                dp, carry, *chunk_args, mdata,
                k=k, use_armijo=use_armijo,
                gtol_relative=gtol_rel, ptol_relative=ptol_rel,
                objtol_relative=objtol_rel, q_max=q_max,
                highprecision=bool(config.eigval_highprecision),
                dual_safeguard=bool(config.dual_safeguard),
                lbfgs_compact=config.lbfgs_impl == "compact",
                blk_b=blk[0], blk_kmax=blk[1],
                blk_margin_frac=blk_margin_frac, blk_k_min=blk_k_min,
                **mkw,
            )

        new_steps = int(carry.ic.steps)
        new_majors = int(carry.majoriters)
        vio_norm = float(vio_norm_d)
        if os.environ.get("SDPLR_DEBUG_DISPATCH"):
            print(f"[dispatch] steps {steps_now}->{new_steps} "
                  f"majors {majors_now}->{new_majors} r={r} q={q_max} "
                  f"blk={blk} wall={time.time() - t_dispatch:.3f}s",
                  flush=True)
        if adapt:
            # re-target the next dispatch's step budget to ~target_s of
            # device time (the int() sync above already forced completion,
            # so the wall time is an honest execution measure; the first
            # dispatch includes compile time and under-estimates the rate,
            # which only makes the next chunk conservatively small)
            dt = max(time.time() - t_dispatch, 1e-3)
            did = max(new_steps - steps_now, 1)
            rate = did / dt
            chunk_now = int(
                min(max(rate * config.dispatch_target_s, 64),
                    config.inner_chunk)
            )
        total_iter = base_total + new_steps
        majoriter = base_major + new_majors

        now = time.time()
        if config.printlevel > 0 and (
            now - lastprint >= config.printfreq or bool(carry.converged)
        ):
            lastprint = now
            print_intermediate(
                config.dataset, majoriter, new_steps, total_iter,
                float(carry.ic.L_val), float(carry.ic.vio_raw[m]),
                float(carry.sigma), float(carry.cur_gtol),
                float(carry.cur_ptol), float(carry.ic.grad_norm), vio_norm,
                float(carry.min_gap), float(carry.max_dual),
            )

        if config.checkpoint_path is not None:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(
                config.checkpoint_path,
                R=np.asarray(carry.ic.R[:n]), lam=np.asarray(carry.lam),
                sigma=float(carry.sigma), r=r, majoriter=majoriter,
                total_iter=total_iter,
            )

        if bool(carry.converged):
            break
        if final_polish and new_majors == majors_now:
            # the f32 gradient floor can sit above cur_gtol forever in
            # the polish phase (stagnation break off), so the inner loop
            # would never reach another major boundary and the gap would
            # never be re-evaluated against the polished iterate (an
            # n=800 θ run ground 600k+ iterations on a STALE 1.4e-2 gap
            # this way). Pull cur_gtol just below the current gradient
            # norm so the next dispatch crosses a boundary and
            # re-certifies.
            carry = carry._replace(
                cur_gtol=jnp.maximum(
                    carry.ic.grad_norm * jnp.asarray(0.9, dtype),
                    jnp.asarray(_gtol_floor(config, dtype), dtype),
                )
            )
        if (tried_polish and not final_polish and stag_tol == -np.inf
                and total_iter - polish_start > POLISH_BUDGET):
            # polish budget exhausted without the gap counter resolving:
            # restore the stagnation break so the next stall goes straight
            # to rank doubling
            stag_tol = saved_stag_tol
        if bool(carry.rank_double):
            # before paying 2× per iteration at a doubled rank, try ONE
            # bounded polish (stagnation break off until the gap counter
            # re-fires) at the CURRENT rank: stagnation-deadlock stalls —
            # loops breaking after a handful of fprec-sized steps with λ
            # barely moving — are fixed by the polish alone (an n=20k
            # MaxCut frozen at certified gap 1.001e-2 at rank 10 reaches
            # 2e-5 once the break is disabled; rank was never the
            # problem). The attempt re-arms after every rank change, so
            # genuinely rank-limited problems (Lovász-θ) pay at most one
            # bounded polish per rank level before doubling like the
            # reference (src/coreop.jl:518-526).
            if stag_tol > -np.inf and not tried_polish:
                tried_polish = True
                saved_stag_tol = stag_tol
                stag_tol = -np.inf
                polish_start = total_iter
                if config.printlevel > 0:
                    print("stagnation-deadlock stall; disabling the "
                          "stagnation break (bounded polish) before "
                          "rank doubling.")
                carry = carry._replace(
                    rank_double=jnp.asarray(False),
                    rankupd_cnt=jnp.asarray(config.rankupd_tol, jnp.int32),
                    ic=carry.ic._replace(stagnated=jnp.zeros((), bool)),
                )
                continue
            if tried_polish and stag_tol == -np.inf:
                # polish attempt did not close the gap: restore the
                # stagnation break and fall through to rank doubling
                stag_tol = saved_stag_tol
            r_new = next_rank(r, n, m)
            if r_new == r:
                # already at the Barvinok–Pataki cap: a "rank double" is a
                # no-op, so escalate the Lanczos budget instead — the gap
                # stall that triggered the counter is often a dual bound
                # limited by eigensolve quality (safeguard margin), not by
                # the primal rank. Bounded: q_boost doubles to ≤64.
                if q_boost >= 64:
                    if not final_polish:
                        # last resort: permanent stagnation-off grind at
                        # the cap rank until time/iteration limits
                        final_polish = True
                        stag_tol = -np.inf
                        if config.printlevel > 0:
                            print("all budgets maxed; final polish phase "
                                  "(stagnation break off).")
                        carry = carry._replace(
                            rank_double=jnp.asarray(False),
                            rankupd_cnt=jnp.asarray(
                                config.rankupd_tol, jnp.int32),
                            ic=carry.ic._replace(
                                stagnated=jnp.zeros((), bool)),
                        )
                        continue
                    # every escape hatch exhausted (stagnation polish,
                    # rank at cap, Lanczos at its ceiling) and the gap
                    # still stalls: stop instead of grinding to the limit
                    print("Warning: duality gap stalled with rank at the "
                          "Barvinok-Pataki cap and the Lanczos budget "
                          "exhausted. Stop optimizing.")
                    break
                q_boost = min(q_boost * 2, 64)
                if config.printlevel > 0:
                    print(f"rank at Barvinok-Pataki cap {r}; "
                          f"raising Lanczos budget x{q_boost}.")
                carry = carry._replace(
                    rank_double=jnp.asarray(False),
                    rankupd_cnt=jnp.asarray(config.rankupd_tol, jnp.int32),
                )
                continue
            base_total = total_iter
            base_major = majoriter
            r = r_new
            tried_polish = False   # re-arm the bounded polish per level
            if config.printlevel > 0:
                print(f"rank doubled, new rank is {r}.")
            if config.rank_update_mode == "warm" and config.init_func is None:
                # a user init_func takes precedence over warm-starting:
                # the reference re-inits through it on every rank update
                # (src/coreop.jl:518-526 → src/structs.jl:231-234)
                R = _warm_vars(dp, carry.ic.R, r, rng, dtype)
                newc = init_major_carry(
                    dp, R, carry.lam, float(carry.sigma),
                    float(carry.cur_ptol), float(carry.cur_gtol),
                    carry.key, lbfgs_init(k, dp.n_pad, r, dtype),
                    config.rankupd_tol,
                    gtol_relative=gtol_rel, ptol_relative=ptol_rel,
                    with_cx=cx_for(r),
                )
                # dual values/gap history stay valid across a rank change
                carry = newc._replace(
                    best_lam=carry.best_lam, max_dual=carry.max_dual,
                    min_gap=carry.min_gap,
                )
            else:
                R, lam = _init_vars(prob, dp, r, config, dtype, rng)
                carry = fresh_carry(R, lam, carry.key)
            continue
        if now - starttime > config.maxtime:
            print("Warning: time limit exceeded. Stop optimizing.")
            timed_out = True
            break
        if total_iter > config.maxiter:
            print("Warning: iteration limit exceeded. Stop optimizing.")
            break
        if new_steps == steps_now and new_majors == majors_now:
            print("Warning: no progress in fused dispatch. Stop optimizing.")
            break

    endtime = time.time()
    totaltime = endtime - starttime

    R, lam = carry.ic.R, carry.lam
    vio_raw = carry.ic.vio_raw
    grad_norm = float(carry.ic.grad_norm)

    max_dual_f = float(carry.max_dual)
    best_lam_np = np.asarray(carry.best_lam, dtype=np.float64)
    feas = int(carry.feas_count)
    extra_dual_passes = 0
    if feas == 0 and config.objtol != np.inf and m > 0:
        # the run never reached a strict feasibility boundary (timeout /
        # maxiter / stall): still report a (weak) dual bound from the
        # final iterate, like the reference's loose-boundary bounds
        # (round-4 advisor fix — a timed-out artifact without any lower
        # bound has a meaningless rel_duality_gap)
        key2, sub2 = jax.random.split(carry.key)
        blk_f = blk_for(r)
        obj_now = abs(float(vio_raw[m]))
        mt_f = 0.25 * config.objtol * (
            max(obj_now, 1e-8) if objtol_rel else 1.0
        ) / max(config.prior_trace_bound, 1.0)
        try:
            dv, _, y_d = dual_obj(
                dp, lam, carry.sigma, vio_raw, config.prior_trace_bound,
                max(base_total + int(carry.ic.steps), 1), sub2,
                highprecision=config.eigval_highprecision,
                safeguard=config.dual_safeguard,
                block=blk_f if blk_f[0] else None,
                margin_target=mt_f, R_seed=R,
            )
            if float(dv) > max_dual_f:
                max_dual_f = float(dv)
                best_lam_np = -np.asarray(y_d[:m], dtype=np.float64)
            feas = 1
            extra_dual_passes = blk_f[1] if blk_f[0] else 1024
        except Exception as e:  # never let the fallback kill the result
            print(f"Warning: fallback dual bound failed: {e}")

    # ---- dual-time attribution (BASELINE protocol: totaltime = preprocess
    # + primal + dual, reference src/sdplr.jl:414-425). The fused driver
    # computes its dual bounds inside the device state machine, so the
    # split is reconstructed with ZERO extra dispatches from the MEASURED
    # operator-pass count (MajorCarry.dual_passes — every Lanczos/block
    # step the device actually executed) and an engine-aware per-pass
    # unit cost:
    #   * gather-bound engines (fast-diag / general ELL SpMM): one
    #     operator pass costs ~nnz × 3 ns regardless of the lane count
    #     (ops/spmm.py) — a 1-lane or b-lane Krylov pass costs the SAME
    #     as a rank-r SpMM. primal = passes-per-iter × steps (1 for
    #     fast-diag's single-SpMM iteration, 3 for the general engine's
    #     two line-search products + adjoint).
    #   * matmul-bound engines (dense-MXU / megakernel / entry-mask):
    #     cost ∝ lanes, so an inner iteration costs ~3·r units and a
    #     Krylov pass carries its lane count (block size b or 1).
    # Only the per-pass cost-equivalence is modeled (the A/B in
    # exps/ab_dualtime put its error at ~2x on mixed workloads); the
    # pass counts themselves are exact. Clamped to [0, totaltime].
    dual_time = 0.0
    total_steps = base_total + int(carry.ic.steps)
    dual_passes = int(carry.dual_passes) + extra_dual_passes
    if dual_passes > 0 and total_steps > 0:
        engine = _engine_name(dp, bool(mega_kwargs(r)[0]))
        blk_now = blk_for(r)
        lanes = max(blk_now[0], 1)
        if engine == "fast-diag-spmm":
            dual_units = float(dual_passes)
            primal_units = 1.0 * float(total_steps)
        elif engine == "xla-general":
            dual_units = float(dual_passes)
            primal_units = 3.0 * float(total_steps)
        else:  # matmul-bound: dense-MXU, megakernel, entry-mask
            dual_units = float(dual_passes) * float(lanes)
            primal_units = 3.0 * float(max(r, 1)) * float(total_steps)
        frac = dual_units / max(dual_units + primal_units, 1e-30)
        dual_time = min(max(frac * totaltime, 0.0), totaltime)

    t_dimacs = time.time()
    if config.eval_DIMACS_errs:
        key, sub = jax.random.split(carry.key)
        DIMACS_errs = dimacs_errors(dp, R, lam, vio_raw, vio_raw[m], sub)
    else:
        DIMACS_errs = np.zeros(6)
    dimacs_time = time.time() - t_dimacs

    obj = float(vio_raw[m])
    min_gap = float(carry.min_gap)
    R_np = np.asarray(R[:n], dtype=np.float64)
    obj_feas = _feasible_obj(prob, dp, R_np, np.asarray(vio_raw))
    final_gap = _final_gap(
        obj if obj_feas is None else obj_feas, max_dual_f, feas
    )
    return {
        "R": R_np,
        "Rt": R_np.T,
        "lambda": best_lam_np,
        "lambda_last": np.asarray(carry.lam, dtype=np.float64),
        "R0": R0_np,
        "Rt0": R0_np.T,
        "lambda0": lam0_np,
        "sigma": float(carry.sigma),
        "grad_norm": grad_norm,
        "primal_vio": vio_norm,
        "obj": obj,
        "max_dual_value": max_dual_f,
        "min_duality_gap": min_gap,
        "rel_duality_gap": final_gap,
        "obj_feasible": obj_feas,
        "duality_gap": float(carry.last_gap),
        "totaltime": totaltime,
        "dual_time": dual_time,
        "dual_time_estimated": True,  # measured passes × modeled unit cost
        "dual_passes": dual_passes,
        "dual_lanczos_time": dual_time,
        "primaltime": totaltime - dual_time,
        "DIMACS_time": dimacs_time,
        "iter": base_total + int(carry.ic.steps),
        "majoriter": base_major + int(carry.majoriters),
        "dual_bounds_computed": feas,
        "DIMACS_errs": np.asarray(DIMACS_errs),
        "ptol": config.ptol,
        "objtol": config.objtol,
        "fprec": config.fprec,
        "rankupd_tol": config.rankupd_tol,
        "r": r,
        "timed_out": timed_out,
        "inner_engine": _engine_name(dp, bool(mega_kwargs(r)[0])) + (
            ("+shard_map-halo"
             if getattr(spmd[1], "halo_send", None) is not None
             else "+shard_map")
            if spmd is not None else ""
        ),
        "dtype": str(jnp.dtype(dtype)),
    }


def _solve_host(prob, dp, r: int, config: SolverConfig, dtype) -> dict:
    n, m = dp.n, dp.m
    rng = np.random.default_rng(config.seed)
    key = jax.random.PRNGKey(config.seed)

    starttime = time.time()
    lastprint = starttime

    R, lam = _init_vars(prob, dp, r, config, dtype, rng)
    R0_np, lam0_np = np.asarray(R[:n]), np.asarray(lam)
    sigma = float(config.sigma0)

    k = int(config.numlbfgsvecs)
    use_armijo = dp.has_inequalities
    gtol_rel = config.gtol_mode == "relative"
    ptol_rel = config.ptol_mode == "relative"
    stag_tol = _stagnation_tol(config, dtype)

    lbfgs = lbfgs_init(k, dp.n_pad, r, dtype)

    # -- inner-loop implementation: Pallas megakernel when eligible ---------
    # (ops/megakernel.py: the whole inner L-BFGS loop in one VMEM-resident
    # kernel; 'auto' picks it for dense-mode equality problems)
    from ..ops.megakernel import make_mega_inner_chunk, megakernel_eligible

    mega_factory = None
    mega_runs = {}
    if config.inner_impl in ("auto", "mega"):
        eligible = megakernel_eligible(dp, r, k, use_armijo, dtype)
        # 'auto' only engages the kernel on real TPU hardware; on CPU the
        # interpreter-mode kernel is for tests and must be asked for.
        if config.inner_impl == "auto" and jax.default_backend() != "tpu":
            eligible = False
        if config.inner_impl == "mega" and not eligible:
            raise ValueError(
                "inner_impl='mega' requested but the problem is not "
                "megakernel-eligible (needs dense MXU mode, equality "
                "constraints only, one diagonal entry per constraint, "
                "and the dense C must fit in VMEM)"
            )
        if eligible:
            mega_factory = make_mega_inner_chunk(
                dp, k=k, gtol_relative=gtol_rel, ptol_relative=ptol_rel
            )

    def mega_run_for(r_now: int):
        """Megakernel runner for the current rank, or None (XLA path)."""
        if mega_factory is None:
            return None
        if r_now not in mega_runs:
            if not megakernel_eligible(dp, r_now, k, use_armijo, dtype):
                return None  # rank grew past the VMEM budget
            mega_runs[r_now] = mega_factory(r_now)
        return mega_runs[r_now]

    cur_gtol = max(1.0 / sigma, _gtol_floor(config, dtype))
    cur_ptol = max(1.0 / sigma**0.1, config.ptol)

    L_val, vio_raw, G, y_full, gnorm_d, pnorm_d = _fg(
        dp, R, lam, sigma, gtol_relative=gtol_rel, ptol_relative=ptol_rel
    )
    grad_norm, vio_norm = float(gnorm_d), float(pnorm_d)

    total_iter = 0
    majoriter = 0
    dual_time = 0.0
    dual_count = 0

    duality_gap = 1e20
    min_duality_gap = 1e20
    max_dual_value = -1e20
    best_lam = np.asarray(lam)
    rankupd_cnt = config.rankupd_tol

    def maybe_print(localiter, force=False):
        nonlocal lastprint
        now = time.time()
        if force or now - lastprint >= config.printfreq:
            lastprint = now
            if config.printlevel > 0:
                print_intermediate(
                    config.dataset, majoriter, localiter, total_iter,
                    float(L_val), float(vio_raw[m]), sigma, cur_gtol, cur_ptol,
                    grad_norm, vio_norm, min_duality_gap, max_dual_value,
                )

    timed_out = False
    for _ in range(config.maxmajoriter):
        majoriter += 1
        localiter = 0

        # ---- inner loop, chunked on device (reference: src/sdplr.jl:190-278)
        while grad_norm > cur_gtol:
            steps = min(config.inner_chunk, config.maxiter - total_iter + 1)
            if steps <= 0:
                break
            mega = mega_run_for(r)
            if mega is not None:
                carry, pnorm_d = mega(
                    R, lbfgs, lam, jnp.asarray(sigma, dtype),
                    jnp.asarray(cur_gtol, dtype), jnp.asarray(stag_tol, dtype),
                    jnp.asarray(steps, jnp.int32),
                )
            elif getattr(dp, "ew_c2", None) is not None:
                # entrywise dense-mask inner loop (ops/entrymask.py)
                from .inner_entry import entry_chunk

                carry, pnorm_d = entry_chunk(
                    dp, R, G, vio_raw, L_val,
                    jnp.asarray(grad_norm, dtype),
                    lbfgs, lam, sigma, cur_gtol, stag_tol, steps,
                    k=k, gtol_relative=gtol_rel, ptol_relative=ptol_rel,
                    lbfgs_compact=config.lbfgs_impl == "compact",
                )
            else:
                carry, pnorm_d = inner_chunk(
                    dp, R, G, y_full, vio_raw, L_val,
                    jnp.asarray(grad_norm, dtype),
                    lbfgs, lam, sigma, cur_gtol, stag_tol, steps,
                    k=k, use_armijo=use_armijo,
                    gtol_relative=gtol_rel, ptol_relative=ptol_rel,
                    lbfgs_compact=config.lbfgs_impl == "compact",
                )
            R, G, y_full, vio_raw, L_val = (
                carry.R, carry.G, carry.y_full, carry.vio_raw, carry.L_val
            )
            lbfgs = carry.lbfgs
            nsteps = int(carry.steps)
            localiter += nsteps
            total_iter += nsteps
            grad_norm = float(carry.grad_norm)
            vio_norm = float(pnorm_d)
            maybe_print(localiter)
            if bool(carry.stagnated):
                break
            if time.time() - starttime > config.maxtime or total_iter > config.maxiter:
                break

        maybe_print(localiter, force=True)

        if time.time() - starttime > config.maxtime:
            print("Warning: time limit exceeded. Stop optimizing.")
            timed_out = True
            break
        if total_iter > config.maxiter:
            print("Warning: iteration limit exceeded. Stop optimizing.")
            break

        rank_double = False
        converged = False

        if vio_norm <= cur_ptol:
            # ---- dual bound (reference: src/sdplr.jl:310-357). The
            # multiplier alternates between the LS estimate (R passed)
            # and the AL ascent iterate across boundaries, mirroring the
            # fused driver (solver/major.py dual_bound) — max_dual
            # accumulates the better of both.
            t_dual = time.time()
            if vio_norm <= config.ptol:
                # strict boundary only, mirroring the fused driver's
                # gating (solver/major.py feasible_branch)
                key, sub = jax.random.split(key)
                blk = (0, 0)
                if (config.lanczos_block >= 0
                        and not config.eigval_highprecision
                        and (config.lanczos_block > 0 or n > 4096)):
                    from ..ops.blocklanczos import block_sizes

                    blk = block_sizes(n, r, max(config.lanczos_block, 0))
                obj_now = abs(float(vio_raw[m]))
                mt = 0.25 * config.objtol * (
                    max(obj_now, 1e-8)
                    if config.objtol_mode == "relative" else 1.0
                ) / max(config.prior_trace_bound, 1.0)
                dual_value, _, y_dual = dual_obj(
                    dp, lam, sigma, vio_raw, config.prior_trace_bound,
                    max(total_iter, 1), sub,
                    highprecision=config.eigval_highprecision,
                    safeguard=config.dual_safeguard,
                    R=R if dual_count % 2 == 0 else None,
                    block=blk if blk[0] else None,
                    margin_target=mt, R_seed=R,
                )
                dual_count += 1
            else:
                dual_value = -np.inf
            dual_time += time.time() - t_dual

            if dual_value > max_dual_value:
                best_lam = -np.asarray(y_dual[:m])
                max_dual_value = dual_value
            # termination objective = the feasibility-projected /
            # entry-certified value, matching the fused driver's
            # major._certified_obj — so the gap the host driver stops on
            # IS the certificate it reports (round-4 advisor fix)
            obj = float(vio_raw[m])
            if vio_norm <= config.ptol:
                if getattr(dp, "entry_trace_cert", False):
                    obj = _entry_term_obj(
                        dp, np.asarray(vio_raw), config.objtol,
                        config.objtol_mode == "relative",
                    )
                else:
                    obj_cert = _feasible_obj(
                        prob, dp, np.asarray(R[:n], dtype=np.float64),
                        np.asarray(vio_raw),
                    )
                    if obj_cert is not None and np.isfinite(obj_cert):
                        obj = float(obj_cert)
            if config.objtol_mode == "relative":
                denom = min(abs(obj), abs(max_dual_value))
                duality_gap = (obj - max_dual_value) / denom if denom > 0 else np.inf
            else:
                duality_gap = obj - max_dual_value

            if vio_norm <= config.ptol:
                if config.objtol == np.inf:
                    converged = True
                elif duality_gap <= config.objtol:
                    min_duality_gap = min(min_duality_gap, duality_gap)
                    converged = True
                else:
                    if min_duality_gap - duality_gap < config.objtol:
                        rankupd_cnt -= 1
                    else:
                        rankupd_cnt = config.rankupd_tol
                    min_duality_gap = min(min_duality_gap, duality_gap)
                    if rankupd_cnt == 0:
                        rank_double = True
            if converged:
                break

            lam = _dual_ascent(dp, lam, sigma, vio_raw)
            cur_ptol = cur_ptol / sigma**0.9
            cur_gtol = cur_gtol / sigma
        else:
            # ---- infeasible: tighten penalty (reference: src/sdplr.jl:365-370)
            sigma *= config.sigmafac
            cur_ptol = 1.0 / sigma**0.1
            cur_gtol = 1.0 / sigma

        # ---- rank doubling (reference: src/sdplr.jl:372-386)
        if rank_double:
            r = next_rank(r, n, m)
            if config.rank_update_mode == "warm" and config.init_func is None:
                # keep R's columns + λ/σ/tolerances/gap history (see
                # _warm_vars; 'restart' reproduces the reference; a user
                # init_func always re-inits through it, like the
                # reference's rank_update! → SolverVars)
                R = _warm_vars(dp, R, r, rng, dtype)
            else:
                R, lam = _init_vars(prob, dp, r, config, dtype, rng)
                sigma = float(config.sigma0)
                cur_ptol = 1.0 / sigma**0.1
                cur_gtol = 1.0 / sigma
                min_duality_gap = 1e20
                max_dual_value = -1e20
            lbfgs = lbfgs_init(k, dp.n_pad, r, dtype)
            rankupd_cnt = config.rankupd_tol
            if config.printlevel > 0:
                print(f"rank doubled, new rank is {r}.")
        else:
            lbfgs = lbfgs_clear(lbfgs)

        cur_ptol = max(cur_ptol, config.ptol)
        cur_gtol = max(cur_gtol, _gtol_floor(config, dtype))

        # checkpoint at the major-iteration boundary (SURVEY §5)
        if (
            config.checkpoint_path is not None
            and majoriter % max(config.checkpoint_every, 1) == 0
        ):
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(
                config.checkpoint_path,
                R=np.asarray(R[:n]), lam=np.asarray(lam), sigma=sigma,
                r=r, majoriter=majoriter, total_iter=total_iter,
            )

        # re-sync state for the next major iteration (src/sdplr.jl:389)
        L_val, vio_raw, G, y_full, gnorm_d, pnorm_d = _fg(
            dp, R, lam, sigma, gtol_relative=gtol_rel, ptol_relative=ptol_rel
        )
        grad_norm, vio_norm = float(gnorm_d), float(pnorm_d)

        if majoriter == config.maxmajoriter:
            print("Warning: major iteration limit exceeded. Stop optimizing.")

    # final re-sync + report (reference: src/sdplr.jl:396-425)
    L_val, vio_raw, G, y_full, gnorm_d, pnorm_d = _fg(
        dp, R, lam, sigma, gtol_relative=gtol_rel, ptol_relative=ptol_rel
    )
    grad_norm, vio_norm = float(gnorm_d), float(pnorm_d)
    maybe_print(-1, force=True)

    endtime = time.time()
    totaltime = endtime - starttime
    primal_time = totaltime - dual_time

    t_dimacs = time.time()
    if config.eval_DIMACS_errs:
        key, sub = jax.random.split(key)
        DIMACS_errs = dimacs_errors(dp, R, lam, vio_raw, vio_raw[m], sub)
    else:
        DIMACS_errs = np.zeros(6)
    dimacs_time = time.time() - t_dimacs

    obj = float(vio_raw[m])
    R_np = np.asarray(R[:n], dtype=np.float64)
    obj_feas = _feasible_obj(prob, dp, R_np, np.asarray(vio_raw))
    rel_gap = _final_gap(
        obj if obj_feas is None else obj_feas, max_dual_value,
        max_dual_value > -1e19,
    )
    # one stable result schema (fixes the reference's exps/solver drift,
    # SURVEY §3.4): both the solver-native and the exps-harness key names.
    return {
        "R": R_np,
        "Rt": R_np.T,
        "lambda": best_lam,
        "lambda_last": np.asarray(lam, dtype=np.float64),
        "R0": R0_np,
        "Rt0": R0_np.T,
        "lambda0": lam0_np,
        "sigma": sigma,
        "grad_norm": grad_norm,
        "primal_vio": vio_norm,
        "obj": obj,
        "max_dual_value": max_dual_value,
        "min_duality_gap": min_duality_gap,
        "rel_duality_gap": rel_gap,
        "obj_feasible": obj_feas,
        "duality_gap": duality_gap,
        "totaltime": totaltime,
        "dual_time": dual_time,
        "dual_lanczos_time": dual_time,
        "primaltime": primal_time,
        "DIMACS_time": dimacs_time,
        "iter": total_iter,
        "majoriter": majoriter,
        "dual_bounds_computed": dual_count,
        "DIMACS_errs": np.asarray(DIMACS_errs),
        "ptol": config.ptol,
        "objtol": config.objtol,
        "fprec": config.fprec,
        "rankupd_tol": config.rankupd_tol,
        "r": r,
        "timed_out": timed_out,
        "inner_engine": _engine_name(dp, mega_run_for(r) is not None),
        "dtype": str(jnp.dtype(dtype)),
    }


def solve_model(model, r: int, config: Optional[SolverConfig] = None,
                **kwargs) -> dict:
    """Run the solver on an external-model adapter (adapter.CustomModel) —
    the analog of the reference's SolverCore.solve! path
    (reference: src/lowrankopt.jl:33-53)."""
    cfg = (config or SolverConfig()).copy_with(**kwargs)
    if cfg.printlevel > 0:
        print_heading(True)
    result = _solve(model, model, r, cfg, model.dtype)
    result["preprocess_time"] = 0.0
    if cfg.printlevel > 0:
        print_heading(False)
    return result
