"""Shared helpers for the experiment drivers (exps/run.py, exps/sweep.py).

Centralizes the result-JSON schema so every committed artifact carries the
provenance and honesty fields the benchmark protocol requires:
``timed_out`` (the run hit its wall-clock cap — its gap fields are then a
time-slice, not a converged certificate), ``seed``, ``commit`` (repo HEAD
at run time), ``inner_engine``, ``maxtime``, ``n`` and the (problem,
graph) identity. Mirrors the reference's per-run JSON dumps
(reference: exps/test.jl:134-161) with one stable schema (SURVEY §3.4
notes the reference's own harness drifted from its solver's keys).
"""

from __future__ import annotations

import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHORT_KEYS = [
    "grad_norm", "primal_vio", "obj", "obj_feasible", "rel_duality_gap",
    "min_duality_gap", "totaltime", "dual_lanczos_time", "primaltime",
    "preprocess_time", "iter", "majoriter", "ptol", "objtol", "fprec",
    "callback_res", "rankupd_tol", "r", "dtype",
    # honesty / provenance fields
    "timed_out", "inner_engine", "dual_bounds_computed", "dual_passes",
]


def setup_jax_cache() -> None:
    """Enable the persistent XLA compilation cache for this process."""
    import sys

    sys.path.insert(0, _REPO)
    from sdplrplus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()


def repo_commit() -> str:
    try:
        return subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def short_result(res: dict, *, problem: str, graph: str, n: int,
                 seed: int, maxtime: float) -> dict:
    import jax

    short = {k: res.get(k) for k in SHORT_KEYS}
    short.update(
        problem=problem, graph=graph, n=n, seed=seed, maxtime=maxtime,
        commit=repo_commit(), solver="SDPLRPlus-TPU",
        # the axon session registers platforms "axon,cpu" — a failed TPU
        # init can silently fall back to host CPU, so every artifact
        # records the backend it actually ran on
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
    )
    return short
