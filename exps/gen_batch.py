"""Generate batch-run shell lines for GNU parallel.

Equivalent of the reference's batch runner (reference:
exps/gen_batch_test.jl:1-18, consumed as
``parallel --jobs N --timeout 28800 < batch_run.txt``,
exps/README.md:17-23). Memory limits use ulimit like the reference.
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graphs", nargs="*", default=[f"G{i}" for i in range(1, 10)])
    p.add_argument("--problem", default="MaxCut")
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--ptol", type=float, default=1e-2)
    p.add_argument("--objtol", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mem-gb", type=int, default=16)
    p.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "batch_run.txt"))
    args = p.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    lines = []
    for g in args.graphs:
        lines.append(
            f"ulimit -d {args.mem_gb * 1024 * 1024}; "
            f"python {here}/run.py --graph {g} --problem {args.problem} "
            f"--rank {args.rank} --ptol {args.ptol} --objtol {args.objtol} "
            f"--seed {args.seed}"
        )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} lines to {args.out}")
    print(f"run with: parallel --jobs 1 --timeout 28800 < {args.out}")


if __name__ == "__main__":
    main()
