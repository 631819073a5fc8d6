"""Warm-start vs restart rank-doubling study on Lovász-θ.

Round-2 made warm-start rank doubling the default to cut Lovász-θ's
17k-23k inner iterations without benchmark evidence (VERDICT r2 weak #5);
this script measures both modes under the benchmark protocol and writes
a summary JSON. If warm does not materially cut inner iterations /
time-to-tol, the default should revert to 'restart' (the reference's
behavior, src/coreop.jl:518-526).

    python exps/rank_mode_study.py --graphs G1 G2 G3 [--maxtime 900]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graphs", nargs="+", default=["G1", "G2", "G3"])
    p.add_argument("--problem", default="LovaszTheta")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--maxtime", type=float, default=900.0)
    p.add_argument("--ptol", type=float, default=1e-2)
    p.add_argument("--objtol", type=float, default=1e-2)
    args = p.parse_args()

    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import lovasz_theta, maxcut
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    builder, tb = ((lovasz_theta, lambda n: 1.0)
                   if args.problem == "LovaszTheta"
                   else (maxcut, lambda n: float(n)))

    rows = []
    for graph in args.graphs:
        A = load_mat_adjacency(gset_path(graph, problem=args.problem))
        n = A.shape[0]
        C, As, b = builder(A)
        common = dict(
            prior_trace_bound=tb(n), dataset=graph, printlevel=0,
            maxtime=args.maxtime,
        )
        # one warmup per graph shape (jit)
        sdplr(C, As, b, args.rank, ptol=1.0, objtol=1.0, **common)
        for mode in ("warm", "restart"):
            t0 = time.time()
            res = sdplr(C, As, b, args.rank, ptol=args.ptol,
                        objtol=args.objtol, rank_update_mode=mode, **common)
            wall = time.time() - t0
            row = dict(
                graph=graph, mode=mode, obj=res["obj"],
                primal_vio=res["primal_vio"],
                rel_duality_gap=res["rel_duality_gap"],
                iter=res["iter"], majoriter=res["majoriter"],
                final_rank=res["r"], wall_s=wall,
                totaltime=res["totaltime"], timed_out=res["timed_out"],
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(__file__), "output",
                       f"rank_mode_study_{args.problem}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"-> {out}")


if __name__ == "__main__":
    main()
