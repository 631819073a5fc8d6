"""Benchmark: MaxCut SDP under the reference's headline protocol
(BASELINE.md): relative ptol = objtol = 1e-2, initial rank 10, trace
bound n (reference: exps/test.jl:176-210).

Measurements:
  * G1 (n=800): device-resident AL iterations/s (the megakernel
    while-loop, free of host/tunnel dispatch latency) AND the end-to-end
    time-to-1e-2 solve (warmup first, mirroring exps/test.jl:179-192),
  * n=20 000 synthetic (RND20000d16, the instance the measured CPU
    baseline converged in 347.6 s): end-to-end time-to-1e-2 solve.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The HEADLINE metric is the end-to-end time-to-tolerance at the LARGEST
measured n, and ``vs_baseline`` is the e2e speedup over the MEASURED CPU
reference baseline at the same n (exps/ref_baseline.py — a faithful
single-thread numpy/scipy port of the reference hot loop, run under the
reference's own single-thread protocol; exps/output/baseline_cpu/).
Device iteration rates are reported in the detail blob, never as
``vs_baseline`` (round-3 verdict weak #1: a device-rate quote next to an
e2e number is apples-to-oranges). 1.0 only when no baseline measurement
exists on disk.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np


def _inner_loop_throughput(cp, dp, r=10, repeats=3):
    """Time inner L-BFGS iterations running entirely on-device.

    Uses the Pallas megakernel (ops/megakernel.py) when the problem is
    eligible — the whole loop lives in VMEM at a few us/iteration — and
    the lax.while_loop chunk otherwise. Throughput is taken as a slope
    between a small and a large step count, which cancels the dispatch
    latency of the remote-TPU tunnel (~26 ms XLA / ~100 ms Pallas per
    dispatch, enormous next to the per-iteration device time).
    """
    import jax
    import jax.numpy as jnp

    from sdplrplus_tpu.ops.megakernel import (
        make_mega_inner_chunk, megakernel_eligible,
    )
    from sdplrplus_tpu.solver.al import al_value_grad
    from sdplrplus_tpu.solver.inner import inner_chunk
    from sdplrplus_tpu.solver.lbfgs import lbfgs_init

    dtype = dp.dtype
    lam = jnp.zeros((cp.m,), dtype)
    sigma = jnp.asarray(2.0, dtype)
    fg = jax.jit(al_value_grad, static_argnames=("gtol_relative", "ptol_relative"))
    lbfgs = lbfgs_init(4, cp.n_pad, r, dtype)
    use_mega = megakernel_eligible(dp, r, 4, False, dtype)
    mega = (
        make_mega_inner_chunk(
            dp, k=4, gtol_relative=True, ptol_relative=True
        )(r)
        if use_mega else None
    )
    # the megakernel is ~20x faster per iteration: use a bigger window so
    # device time dominates timer noise
    steps_small, steps_big = (100, 100_000) if use_mega else (100, 4000)

    def R_of(seed):
        # fresh inputs per run: the remote-execution backend can dedupe
        # repeated identical (program, args) dispatches, which would make
        # repeat timings meaningless
        rng = np.random.default_rng(seed)
        R0 = np.zeros((cp.n_pad, r), dtype=np.float32)
        R0[: cp.n] = rng.uniform(-1, 1, size=(cp.n, r))
        return jnp.asarray(R0, dtype)

    def run(seed, steps):
        R = R_of(seed)
        gtol = jnp.asarray(-1.0, dtype)      # never converge
        nostag = jnp.asarray(-np.inf, dtype)  # no stagnation break
        if use_mega:
            t0 = time.time()
            carry, _ = mega(R, lbfgs, lam, sigma, gtol, nostag,
                            jnp.asarray(steps, jnp.int32))
            jax.block_until_ready(carry.R)
            dt = time.time() - t0
        else:
            L, vio_raw, G, y_full, gn, _ = fg(
                dp, R, lam, sigma, gtol_relative=True, ptol_relative=True
            )
            jax.block_until_ready(G)
            t0 = time.time()
            carry, _ = inner_chunk(
                dp, R, G, y_full, vio_raw, L, gn, lbfgs, lam, sigma,
                gtol, nostag, steps,
                k=4, use_armijo=False, gtol_relative=True, ptol_relative=True,
            )
            jax.block_until_ready(carry.R)
            dt = time.time() - t0
        assert int(carry.steps) == steps
        return dt

    run(0, steps_small)  # compile + warm
    t_small = min(run(s + 1, steps_small) for s in range(repeats))
    t_big = min(run(s + 11, steps_big) for s in range(repeats))
    rate = (steps_big - steps_small) / max(t_big - t_small, 1e-9)
    return rate, ("pallas-megakernel" if use_mega else "xla-while-loop")


def run_bench(graph="G1", dtype="float32"):
    import jax.numpy as jnp

    from sdplrplus_tpu import SDPProblem, compile_problem, sdplr
    from sdplrplus_tpu.models import maxcut
    from sdplrplus_tpu.ops.device import to_device
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    A = load_mat_adjacency(gset_path(graph))
    n = A.shape[0]
    C, As, b = maxcut(A)

    # --- headline: device-resident inner-loop throughput ---------------------
    prob = SDPProblem(C, list(As), b, None)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.dtype(dtype))
    iters_per_sec, engine = _inner_loop_throughput(cp, dp)

    # --- detail: end-to-end solve (warmup then timed) ------------------------
    common = dict(
        prior_trace_bound=float(n), dtype=dtype, printlevel=0, dataset=graph
    )
    # full-ladder warmup (see run_bench_20k's warmup note)
    sdplr(C, As, b, 10, ptol=1e-2, objtol=1e-2, maxtime=900.0, **common)
    t0 = time.time()
    res = sdplr(C, As, b, 10, ptol=1e-2, objtol=1e-2, maxtime=600.0, **common)
    wall = time.time() - t0

    # timing sanity: fail loudly rather than print absurd headline JSON
    # (BENCH_r02 reported dual_time > totaltime and negative primal time)
    total, dual, primal = res["totaltime"], res["dual_time"], res["primaltime"]
    assert 0.0 <= dual <= total, f"dual_time {dual} outside [0, {total}]"
    assert primal >= 0.0, f"negative primaltime {primal}"
    assert abs((primal + dual + res.get("preprocess_time", 0.0)) - total) <= (
        0.05 * total + 1e-6
    ), f"primal {primal} + dual {dual} != total {total}"
    assert res["iter"] > 0 and total > 0

    return {
        "graph": graph,
        "n": n,
        "obj": res["obj"],
        "primal_vio": res["primal_vio"],
        "min_duality_gap": res["min_duality_gap"],
        "iter": res["iter"],
        "majoriter": res["majoriter"],
        "device_al_iters_per_sec": iters_per_sec,
        "inner_engine": engine,
        "e2e_al_iters_per_sec": res["iter"] / total,
        "time_to_tol_s": wall,
        "primal_time_s": res["primaltime"],
        "dual_time_s": res["dual_time"],
        "dtype": res["dtype"],
    }


def _cpu_baseline(graph="G1"):
    """Measured CPU reference baseline (exps/ref_baseline.py): a faithful
    single-thread numpy/scipy port of the reference hot loop, run under
    the same protocol (1 thread, ptol=objtol=1e-2, r=10, trace bound n —
    reference: exps/README.md:23, exps/test.jl:46)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "exps", "output", "baseline_cpu", "MaxCut", f"{graph}.json",
    )
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def run_bench_20k(maxtime=900.0, dtype="float32"):
    """End-to-end timed solve of the n=20k synthetic MaxCut instance the
    CPU baseline converged on (RND20000d16: G(n,M)-style, n=20 000,
    deg 16, seed 1 — exps/run.py synthetic_graph). Warmup solve first
    (tol=1.0), then the timed run at protocol tolerances. Falls back to
    the committed artifact (exps/output/MaxCut/SYN20K) if the live run
    fails (e.g. TPU worker unavailable)."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "exps"))
    from run import synthetic_graph

    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import maxcut

    A = synthetic_graph(20000, 16)
    C, As, b = maxcut(A)
    common = dict(prior_trace_bound=20000.0, dtype=dtype, printlevel=0,
                  dataset="SYN20K")
    # warmup at the REAL tolerances: a tol=1.0 warmup exits before the
    # rank doubling / deep-Lanczos-bucket programs ever compile, so the
    # timed run was paying tens of seconds of XLA compilation — the
    # shape-specialized analog of the reference's JIT warmup
    # (exps/test.jl:179-192) must traverse the same (r, q) ladder
    sdplr(C, As, b, 10, ptol=1e-2, objtol=1e-2, maxtime=maxtime, **common)
    t0 = time.time()
    res = sdplr(C, As, b, 10, ptol=1e-2, objtol=1e-2, maxtime=maxtime,
                **common)
    wall = time.time() - t0
    return {
        "graph": "RND20000d16",
        "n": 20000,
        "obj": res["obj"],
        "primal_vio": res["primal_vio"],
        "rel_duality_gap": res["rel_duality_gap"],
        "iter": res["iter"],
        "majoriter": res["majoriter"],
        "time_to_tol_s": wall,
        "timed_out": res["timed_out"],
        "inner_engine": res.get("inner_engine"),
        "source": "live",
    }


def _artifact_20k():
    """Committed timed-run artifact for the n=20k instance."""
    pat = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "exps", "output", "MaxCut", "SYN20K", "SDPLRTPU-R-*.json",
    )
    for p in sorted(glob.glob(pat)):
        try:
            with open(p) as f:
                d = json.load(f)
            if d.get("ptol", 1.0) <= 1e-2:
                return {
                    "graph": "RND20000d16", "n": 20000, "obj": d["obj"],
                    "primal_vio": d["primal_vio"],
                    "rel_duality_gap": d["rel_duality_gap"],
                    "iter": d["iter"], "majoriter": d["majoriter"],
                    "time_to_tol_s": d["totaltime"],
                    "timed_out": d.get("timed_out"),
                    "inner_engine": d.get("inner_engine"),
                    "source": "artifact:" + os.path.basename(p),
                }
        except Exception:
            continue
    return None


def main():
    from sdplrplus_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    detail = run_bench()
    try:
        d20k = run_bench_20k()
    except Exception as e:
        d20k = _artifact_20k()
        if d20k is not None:
            d20k["live_error"] = f"{type(e).__name__}: {e}"
    base_g1 = _cpu_baseline("G1")
    base_20k = _cpu_baseline("RND20000d16")
    if base_g1:
        detail["baseline_cpu"] = {
            "solver": base_g1.get("solver"),
            "al_iters_per_sec": base_g1["al_iters_per_sec"],
            "time_to_tol_s": base_g1["totaltime"],
            "obj": base_g1["obj"],
            "e2e_speedup_time_to_tol": base_g1["totaltime"]
            / detail["time_to_tol_s"],
        }
    if d20k is not None and base_20k:
        d20k["baseline_cpu"] = {
            "solver": base_20k.get("solver"),
            "time_to_tol_s": base_20k["totaltime"],
            "obj": base_20k["obj"],
            "e2e_speedup_time_to_tol": base_20k["totaltime"]
            / d20k["time_to_tol_s"],
        }

    # headline: e2e time-to-tol at the LARGEST measured n; vs_baseline is
    # the e2e speedup over the measured CPU reference port at the same n
    if d20k is not None:
        value = d20k["time_to_tol_s"]
        metric = "time_to_tol_maxcut_n20000"
        vs_baseline = (base_20k["totaltime"] / value) if base_20k else 1.0
    else:
        value = detail["time_to_tol_s"]
        metric = "time_to_tol_maxcut_G1"
        vs_baseline = (base_g1["totaltime"] / value) if base_g1 else 1.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": "s",
                "vs_baseline": round(vs_baseline, 3),
                "detail": {
                    "methodology": (
                        "vs_baseline = CPU-baseline time-to-1e-2 over TPU "
                        "time-to-1e-2 at the same n (end-to-end, warmup "
                        "excluded on both sides). The CPU baseline is a "
                        "single-thread port of the reference hot loop "
                        "(exps/ref_baseline.py; Julia unavailable "
                        "in-image) whose per-nnz gather kernel is a fused "
                        "C SIMD loop equivalent to the reference's "
                        "@simd mydot — 6-10x stronger than the round-4 "
                        "numpy-gather port (see exps/output/baseline_cpu/"
                        "oplevel_bound.json), run under the reference's "
                        "own 1-thread protocol. Device iteration rates "
                        "are reported per-instance below, not as the "
                        "headline."
                    ),
                    "maxcut_G1": detail,
                    "maxcut_n20000": d20k,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
