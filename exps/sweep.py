"""In-process benchmark sweep: every (problem, graph) pair in ONE process.

The per-process batch runner (exps/gen_batch.py + GNU-parallel style,
mirroring the reference's exps/batch_test.txt) reconnects to the TPU and
recompiles for every run; this driver keeps one process so same-shape
graphs (G1-G9 are all n=800) reuse the jit cache, and one warmup per
problem family suffices.

    python exps/sweep.py [--problems MaxCut CutNorm ...] [--graphs G1 G2 ...]
                         [--ptol 1e-2] [--objtol 1e-2] [--maxtime 900]

Writes the same per-run JSON files as exps/run.py plus a summary line per
run to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common import setup_jax_cache, short_result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problems", nargs="+",
                   default=["MaxCut", "MinimumBisection", "CutNorm",
                            "LovaszTheta", "MuConductance"])
    p.add_argument("--mu", type=float, default=0.1)
    p.add_argument("--graphs", nargs="+",
                   default=[f"G{i}" for i in range(1, 10)])
    p.add_argument("--ptol", type=float, default=1e-2)
    p.add_argument("--objtol", type=float, default=1e-2)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--maxtime", type=float, default=900.0)
    p.add_argument("--dtype", type=str, default=None)
    p.add_argument("--data-root", type=str,
                   default="/root/reference/exps/data")
    p.add_argument("--output", type=str,
                   default=os.path.join(os.path.dirname(__file__), "output",
                                        "_live"),
                   help="default is the gitignored _live tree so ad-hoc "
                        "reruns never dirty committed artifacts; pass "
                        "exps/output explicitly (and commit in the same "
                        "change) to refresh the published results")
    args = p.parse_args()
    setup_jax_cache()

    from sdplrplus_tpu import sdplr
    from sdplrplus_tpu.models import (
        cutnorm, lovasz_theta, maxcut, minimum_bisection,
        mu_conductance_ineq, mu_conductance_ub,
    )
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency
    from sdplrplus_tpu.utils.rounding import (
        dummy_callback, maxcut_rounding, minimum_bisection_rounding,
    )

    import numpy as np

    def _mu_tb(n, A):
        volG = float(np.asarray(A.sum()))
        return float(n) * mu_conductance_ub(volG, args.mu)

    builders = {
        "MaxCut": (maxcut, maxcut_rounding, lambda n, A: float(n)),
        "MinimumBisection": (minimum_bisection, minimum_bisection_rounding,
                             lambda n, A: float(n)),
        "LovaszTheta": (lovasz_theta, dummy_callback, lambda n, A: 1.0),
        "CutNorm": (cutnorm, dummy_callback, lambda n, A: float(n)),
        "MuConductance": (lambda A: mu_conductance_ineq(A, args.mu),
                          dummy_callback, _mu_tb),
    }

    failures = []
    for prob_name in args.problems:
        builder, callback, tb = builders[prob_name]
        warmed = False
        for graph in args.graphs:
            data_problem = ("MaxCut" if prob_name == "MuConductance"
                            else prob_name)
            path = gset_path(graph, problem=data_problem,
                             root=args.data_root)
            if not os.path.exists(path):
                print(f"[{prob_name}/{graph}] SKIP (no {path})")
                continue
            try:
                A = load_mat_adjacency(path)
                n = A.shape[0]
                out = builder(A)
                C, As, b = out[:3]
                ct = out[3] if len(out) == 4 else None
                common = dict(
                    constraint_types=ct, prior_trace_bound=tb(n, A),
                    dataset=graph, seed=args.seed, dtype=args.dtype,
                    printlevel=0,
                )
                if not warmed:  # one warmup per problem family (jit)
                    sdplr(C, As, b, args.rank, ptol=1.0, objtol=1.0,
                          maxtime=args.maxtime, **common)
                    warmed = True
                t0 = time.time()
                res = sdplr(C, As, b, args.rank, ptol=args.ptol,
                            objtol=args.objtol, maxtime=args.maxtime,
                            **common)
                wall = time.time() - t0
                res["callback_res"] = callback(A, res["R"])
                short = short_result(
                    res, problem=prob_name, graph=graph, n=n,
                    seed=args.seed, maxtime=args.maxtime,
                )
                outdir = os.path.join(args.output, prob_name, graph)
                os.makedirs(outdir, exist_ok=True)
                fp = os.path.join(
                    outdir,
                    f"SDPLRTPU-R-{args.rank}-seed-{args.seed}"
                    f"-tol-{args.ptol}.json",
                )
                with open(fp, "w") as f:
                    json.dump(short, f, indent=4, default=float)
                ok = (res["primal_vio"] <= args.ptol * 1.01
                      and res["rel_duality_gap"] <= args.objtol * 1.01)
                print(f"[{prob_name}/{graph}] obj={res['obj']:.4f} "
                      f"pinfeas={res['primal_vio']:.2e} "
                      f"gap={res['rel_duality_gap']:.2e} wall={wall:.2f}s "
                      f"iters={res['iter']} majors={res['majoriter']} "
                      f"{'TIMED-OUT ' if res.get('timed_out') else ''}"
                      f"{'OK' if ok else 'MISSED-TOL'}",
                      flush=True)
                if not ok:
                    failures.append(f"{prob_name}/{graph}: missed tolerance")
            except Exception as e:  # keep sweeping; report at the end
                print(f"[{prob_name}/{graph}] FAIL: {type(e).__name__}: {e}",
                      flush=True)
                failures.append(f"{prob_name}/{graph}: {e}")
    print(f"\nsweep done; {len(failures)} failure(s)")
    for f in failures:
        print("  -", f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
