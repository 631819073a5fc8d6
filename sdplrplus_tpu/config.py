"""Solver configuration.

TPU-native re-design of the reference's ``BurerMonteiroConfig``
(reference: src/options.jl:1-24). All knobs carry the same semantics and
defaults; TPU-specific knobs (dtype, inner_chunk, ...) are additive.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple


@dataclasses.dataclass
class SolverConfig:
    # -- tolerances (reference: src/options.jl:2-4,21-23) --------------------
    ptol: float = 1e-2            # primal infeasibility tolerance
    gtol: float = 0.0             # stationarity tolerance
    objtol: float = 1e-2          # duality-gap tolerance (inf to skip)
    ptol_mode: str = "relative"   # 'relative' (/ ||b||) or 'absolute'
    gtol_mode: str = "relative"   # 'relative' (/ ||C||_F) or 'absolute'
    objtol_mode: str = "relative"

    # -- augmented-Lagrangian schedule (src/options.jl:5-6) ------------------
    sigma0: float = 2.0           # initial penalty parameter
    sigmafac: float = 2.0         # penalty growth factor

    # -- iteration / time limits (src/options.jl:7,11-12) --------------------
    maxtime: float = 3600.0
    maxmajoriter: int = 10**5
    maxiter: int = 10**7

    # -- optimizer (src/options.jl:10,13-14) ----------------------------------
    numlbfgsvecs: int = 4
    fprec: float = 1e8            # stagnation break: rel ΔL < fprec * eps
    rankupd_tol: int = 4          # majoriters w/o gap progress before rank x2
    # rank doubling: 'warm' keeps the converged factor and appends small
    # random columns (plus λ/σ/tolerance state), so the solver only has
    # to learn the new directions; 'restart' re-draws R and resets all
    # schedule state like the reference (src/coreop.jl:518-526).
    rank_update_mode: str = "warm"

    # -- problem knowledge (src/options.jl:15) --------------------------------
    prior_trace_bound: float = 1e18

    # -- observability (src/options.jl:8-9,16-17) -----------------------------
    printlevel: int = 1
    printfreq: float = 60.0
    dataset: str = ""
    eval_DIMACS_errs: bool = False

    # -- eigensolver for the dual bound (src/options.jl:18) -------------------
    # False: randomized Lanczos (default). True: high-precision path
    # (Lanczos with full reorthogonalization + more iterations).
    eigval_highprecision: bool = False
    # Residual safeguard for the dual bound: subtract the Lanczos Ritz
    # residual β_k·|s_k| (plus ulp slack) from the λ_min estimate before
    # forming the dual value, so reported duality gaps are certified in
    # practice and termination can't fire on an unconverged eigensolve.
    # The reference uses the raw Ritz value (src/coreop.jl:503-511),
    # which can over-shoot λ_min and yield negative "gaps".
    dual_safeguard: bool = True

    # -- custom initialization (src/options.jl:19-20) -------------------------
    # init_func(problem, r, *init_args) -> (R0 [n, r], lam0 [m])
    init_func: Optional[Callable[..., Any]] = None
    init_args: Tuple = ()

    # -- TPU-specific ----------------------------------------------------------
    # dtype of all device computation. None -> float64 when jax x64 is
    # enabled (unit-test path on CPU), float32 otherwise (TPU fast path).
    dtype: Optional[str] = None
    seed: int = 0                 # PRNG seed for random R0 / Lanczos start
    inner_chunk: int = 1000       # device inner-loop steps per host sync
    # target seconds of device work per fused dispatch: the driver adapts
    # the per-dispatch step budget (≤ inner_chunk) to this wall time.
    # Long single dispatches (≥ ~30 s at n=100k) reproducibly fault the
    # remote TPU worker, and coarse dispatches also make maxtime checks
    # sluggish. 0 disables adaptation (always inner_chunk).
    dispatch_target_s: float = 5.0
    # fused outer driver (solver/major.py): the entire major-iteration state
    # machine — inner loop, dual bound, dual ascent, σ/tolerance schedule —
    # runs as ONE device program per dispatch, amortizing host<->device RTT
    # over many major iterations. False falls back to the host-driven loop.
    fused_outer: bool = True
    # dense MXU mode: hold C as a dense matrix so the hot ops are plain
    # matmuls (diagonal-constraint problems only). None = auto heuristic
    # (see compile.py), True = force, False = forbid.
    dense_mode: Optional[bool] = None
    # entrywise dense-mask mode: for equality-only problems whose narrow
    # constraints each touch one distinct triu position (e.g. Lovász-θ),
    # the inner loop carries violations/duals as dense masked matrices —
    # all constraint math becomes MXU matmuls + masked reductions
    # (ops/entrymask.py). None = auto (see compile.py), True = force
    # (error if ineligible), False = forbid.
    entry_mode: Optional[bool] = None
    # L-BFGS direction implementation: 'compact' (Byrd–Nocedal compact
    # representation — 3 MXU contractions/iter) or 'two_loop' (classic
    # recursion — 4k sequential dots/axpys). Identical math.
    lbfgs_impl: str = "compact"
    # inner-loop implementation for the host-driven (fused_outer=False)
    # path: 'auto' selects the Pallas megakernel (ops/megakernel.py) when
    # the problem is eligible (dense MXU mode, equality-only, diagonal
    # row<->constraint bijection, fits VMEM), 'mega' forces it (error if
    # ineligible), 'xla' forces the lax.while_loop inner chunk.
    inner_impl: str = "auto"
    lanczos_tol_scale: float = 1.0
    # block-Lanczos dual bound (ops/blocklanczos.py): run the Krylov
    # recurrence on an (n, b) block seeded with the primal factor, ONE
    # b-lane operator pass per step (the gather SpMM is rank-independent
    # up to 64 lanes, ops/spmm.py) with adaptive early exit on the
    # certified residual margin — instead of q ≈ 2⌈√iter·log n⌉ rank-1
    # passes per bound (reference: src/coreop.jl:402). 0 = auto (block
    # path for n > 4096, where the rank-1 schedule dominated wall time);
    # -1 = always scalar; > 0 = force this block size.
    lanczos_block: int = 0
    # checkpoint/resume (SURVEY §5): serialize (R, λ, σ, r) at major-iter
    # boundaries; resume via utils.checkpoint.warm_start_from
    checkpoint_path: Optional[str] = None
    checkpoint_every: int = 1     # major iterations between checkpoints
    # tracing/profiling (SURVEY §5): when set, the solve runs under
    # jax.profiler.trace writing a TensorBoard-readable trace here
    profile_dir: Optional[str] = None
    # multi-device SPMD (SURVEY §5 sharding plan): devices > 1 runs the
    # fused outer driver under jax.shard_map over a 1-D mesh — the factor
    # R / ELL rows / L-BFGS history row-shard, constraint vectors
    # replicate, scalar reductions and Lanczos recurrences psum over ICI
    # (parallel/shardmap.py). Equivalent to passing solve(..., mesh=...).
    devices: int = 1

    def copy_with(self, **kwargs) -> "SolverConfig":
        unknown = set(kwargs) - {f.name for f in dataclasses.fields(self)}
        if unknown:
            raise ValueError(f"Unrecognized config keyword(s): {sorted(unknown)}")
        cfg = dataclasses.replace(self, **kwargs)
        if cfg.lbfgs_impl not in ("compact", "two_loop"):
            raise ValueError(
                f"lbfgs_impl must be 'compact' or 'two_loop', got "
                f"{cfg.lbfgs_impl!r}"
            )
        if cfg.rank_update_mode not in ("warm", "restart"):
            raise ValueError(
                f"rank_update_mode must be 'warm' or 'restart', got "
                f"{cfg.rank_update_mode!r}"
            )
        if cfg.inner_impl not in ("auto", "mega", "xla"):
            raise ValueError(
                f"inner_impl must be 'auto', 'mega' or 'xla', got "
                f"{cfg.inner_impl!r}"
            )
        return cfg


def resolve_dtype(config: SolverConfig):
    import jax
    import jax.numpy as jnp

    if config.dtype is not None:
        dt = jnp.dtype(config.dtype)
        if dt == jnp.dtype("float64") and not jax.config.jax_enable_x64:
            # without this, every jnp.asarray(..., f64) silently
            # truncates to f32 and the "f64 run" is an f32 run with a
            # warning stream — enable x64 instead (safe at runtime; it
            # only widens the set of available dtypes)
            jax.config.update("jax_enable_x64", True)
        return dt
    return jnp.dtype(jnp.float64) if jax.config.jax_enable_x64 else jnp.dtype(jnp.float32)
