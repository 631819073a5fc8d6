"""Render the benchmark results table (README section + stdout) from the
committed per-run JSONs under exps/output/.

    python exps/make_results_table.py [--update-readme]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")
README = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "README.md")

BEGIN = "<!-- results:begin -->"
END = "<!-- results:end -->"


def collect():
    rows = []
    for path in sorted(glob.glob(os.path.join(OUT, "*", "*", "*.json"))):
        parts = path.split(os.sep)
        problem, graph = parts[-3], parts[-2]
        base = os.path.basename(path)
        if (problem == "baseline_cpu" or "warmup" in base
                or base.endswith("_certify.json")):
            continue
        with open(path) as f:
            d = json.load(f)
        rows.append((problem, graph, d))
    return rows


def render(rows):
    lines = [
        "| problem | graph | n | obj | pinfeas | rel gap | iters | "
        "time (s) | engine | status |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    order = ["MaxCut", "MinimumBisection", "CutNorm", "LovaszTheta",
             "MuConductance"]
    rows = sorted(rows, key=lambda t: (
        order.index(t[0]) if t[0] in order else 99, t[1]))
    for problem, graph, d in rows:
        gap = d.get("rel_duality_gap", d.get("min_duality_gap"))
        status = "TIMED-OUT" if d.get("timed_out") else "converged"
        engine = (d.get("inner_engine") or "?").replace("pallas-", "")
        lines.append(
            f"| {problem} | {graph} | {d.get('n', '?')} | {d['obj']:.4f} | "
            f"{d['primal_vio']:.1e} | {gap:.1e} | {d['iter']} | "
            f"{d['totaltime']:.2f} | {engine} | {status} |"
        )
    return "\n".join(lines)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--update-readme", action="store_true")
    args = p.parse_args()
    table = render(collect())
    print(table)
    if args.update_readme:
        with open(README) as f:
            s = f.read()
        block = (
            f"{BEGIN}\n\n## Benchmark results (TPU v5e, 1 chip, f32, "
            "ptol = objtol = 1e-2, r0 = 10)\n\n"
            "Per-run JSONs under `exps/output/`; `rel gap` is the final "
            "certificate (obj of the feasibility-projected iterate vs the "
            "residual-safeguarded Lanczos dual — see docs/API.md). "
            "G6–G9 duplicate G1–G4's patterns in the vendored data "
            "(weights were dropped upstream).\n\n"
            f"{table}\n\n{END}"
        )
        if BEGIN in s:
            pre = s.split(BEGIN)[0]
            post = s.split(END)[1]
            s = pre + block + post
        else:
            s = s.rstrip() + "\n\n" + block + "\n"
        with open(README, "w") as f:
            f.write(s)
        print(f"-> {README}")


if __name__ == "__main__":
    main()
