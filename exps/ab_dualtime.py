"""Trajectory-matched dual-time A/B: fused work-model vs host measured.

The fused driver computes dual bounds inside the device state machine
and attributes dual time from the MEASURED operator-pass count times a
modeled per-pass cost (solver/outer.py dual-time attribution); the host
driver wall-clocks each dual_obj call directly. Both drivers execute
the same algorithm (equivalence tested at n=2000: identical iteration /
major / bound counts since round 5), so running the SAME instance
through both gives an apples-to-apples model-vs-measured comparison —
the round-4 A/B compared trajectories that shared nothing (4137-iter
fused vs 638-iter host) and validated nothing.

    python exps/ab_dualtime.py [--n 20000] [--graph G1] [--out FILE]

The JSON records both trajectories and the model error; a mismatch in
(iter, majoriter, dual_bounds_computed) marks the run not matched.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from common import repo_commit, setup_jax_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=0,
                    help="synthetic size (0: use --graph)")
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--graph", type=str, default="G1")
    ap.add_argument("--maxtime", type=float, default=1200.0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    setup_jax_cache()

    from run import synthetic_graph
    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import maxcut
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    if args.n:
        A = synthetic_graph(args.n, args.deg)
        tag = f"SYN{args.n}"
    else:
        A = load_mat_adjacency(gset_path(args.graph))
        tag = args.graph
    n = A.shape[0]
    C, As, b = maxcut(A)[:3]

    common = dict(prior_trace_bound=float(n), ptol=1e-2, objtol=1e-2,
                  printlevel=0, dtype="float32", maxtime=args.maxtime,
                  dataset=tag)

    def one(fused):
        # full-ladder warmup (same tolerances; see bench.py warmup note)
        sdplr(C, As, b, 10, fused_outer=fused, **common)
        t0 = time.time()
        res = sdplr(C, As, b, 10, fused_outer=fused, **common)
        wall = time.time() - t0
        return {
            "driver": "fused" if fused else "host",
            "wall_s": wall,
            "totaltime": res["totaltime"],
            "dual_time": res["dual_time"],
            "dual_time_estimated": bool(res.get("dual_time_estimated")),
            "dual_share": res["dual_time"] / max(res["totaltime"], 1e-9),
            "dual_passes": res.get("dual_passes"),
            "iter": res["iter"],
            "majoriter": res["majoriter"],
            "bounds": res["dual_bounds_computed"],
            "rel_duality_gap": res["rel_duality_gap"],
            "obj": res["obj"],
            "timed_out": res["timed_out"],
            "inner_engine": res["inner_engine"],
        }

    fused = one(True)
    host = one(False)
    matched = (
        fused["iter"] == host["iter"]
        and fused["majoriter"] == host["majoriter"]
        and fused["bounds"] == host["bounds"]
    )
    err = None
    if host["dual_share"] > 0:
        err = abs(fused["dual_share"] - host["dual_share"]) / host[
            "dual_share"]
    out = {
        "instance": tag, "n": n,
        "commit": repo_commit(),
        "trajectory_matched": matched,
        "fused": fused,
        "host": host,
        "model_vs_measured_dual_share_rel_err": err,
        "note": ("fused.dual_time = measured passes x modeled per-pass "
                 "cost; host.dual_time = wall-clocked dual_obj calls"),
    }
    path = args.out or os.path.join(
        os.path.dirname(__file__), "output", f"ab_dualtime_{tag}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(json.dumps(out, indent=2, default=float))
    print(f"-> {path}")


if __name__ == "__main__":
    main()
