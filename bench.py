"""Benchmark: MaxCut SDP on Gset G1 (n=800), the reference's headline
protocol (BASELINE.md): warmup solve for jit, then a timed solve at
relative ptol = objtol = 1e-2, initial rank 10, trace bound n
(reference: exps/test.jl:176-210).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no in-repo numbers (BASELINE.json "published":
{}), so vs_baseline is normalized to 1.0 = this framework's round-1
recorded value when no prior BENCH file exists; against a prior
BENCH_r*.json it reports the speedup over the oldest recorded round.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np


def run_bench(graph="G1", dtype="float32"):
    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import maxcut
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    A = load_mat_adjacency(gset_path(graph))
    n = A.shape[0]
    C, As, b = maxcut(A)

    common = dict(
        prior_trace_bound=float(n),
        dtype=dtype,
        printlevel=0,
        dataset=graph,
    )

    # warmup (jit compilation), mirrors exps/test.jl:179-192
    sdplr(C, As, b, 10, ptol=1.0, objtol=1.0, maxtime=300.0, **common)

    t0 = time.time()
    res = sdplr(C, As, b, 10, ptol=1e-2, objtol=1e-2, maxtime=600.0, **common)
    wall = time.time() - t0

    iters = max(res["iter"], 1)
    iters_per_sec = iters / max(res["primaltime"], 1e-9)
    return {
        "graph": graph,
        "n": n,
        "obj": res["obj"],
        "primal_vio": res["primal_vio"],
        "min_duality_gap": res["min_duality_gap"],
        "iter": res["iter"],
        "majoriter": res["majoriter"],
        "al_iters_per_sec": iters_per_sec,
        "time_to_tol_s": wall,
        "primal_time_s": res["primaltime"],
        "dual_time_s": res["dual_time"],
        "dtype": res["dtype"],
    }


def _prior_value():
    """Earliest recorded bench value, for round-over-round comparison."""
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            v = rec.get("value")
            if v:
                return float(v)
        except Exception:
            continue
    return None


def main():
    detail = run_bench()
    value = detail["al_iters_per_sec"]
    prior = _prior_value()
    vs_baseline = value / prior if prior else 1.0
    print(
        json.dumps(
            {
                "metric": "al_iters_per_sec_maxcut_G1",
                "value": round(value, 3),
                "unit": "iter/s",
                "vs_baseline": round(vs_baseline, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
