"""Multi-device scaling measurement: fused-driver inner-step time and
SpMM comms volume at 1/2/4/8 devices, halo-exchange vs all-gather.

Runs on the virtual CPU mesh (xla_force_host_platform_device_count) —
ICI bandwidth is obviously not modeled on host, so the TIME columns
measure compute-path scaling (work division + collective overhead in
XLA's CPU runtime) while the COMMS columns report the analytically
exact per-pass word counts each layout moves (the quantity that rides
ICI on real hardware):

    all-gather:  (n_pad − n_loc) · r   words received per device per pass
    halo:        (nd − 1) · H · r      words received per device per pass

    python exps/scaling.py [--n 20000] [--deg 16] [--out FILE]

Writes one JSON with a row per (graph kind, nd, layout).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip(),
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--window", type=int, default=0,
                    help="locality window of the local graph "
                         "(default n/64)")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rank", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from run import synthetic_graph, synthetic_local_graph
    from common import repo_commit
    from sdplrplus_tpu.compile import compile_problem
    from sdplrplus_tpu.models import maxcut
    from sdplrplus_tpu.ops.device import to_device
    from sdplrplus_tpu.parallel.shardmap import (
        AXIS, make_shardmap_major, shardmap_problem,
    )
    from sdplrplus_tpu.problem import SDPProblem
    from sdplrplus_tpu.solver.lbfgs import lbfgs_init
    from sdplrplus_tpu.solver.major import init_major_carry, major_chunk

    n = args.n
    window = args.window or max(n // 64, 32)
    r, k = args.rank, 4
    dtype = jnp.float32
    rows = []

    graphs = {
        "random": synthetic_graph(n, args.deg),
        "local": synthetic_local_graph(n, args.deg, window),
    }

    def bench_steps(run_fn, carry0, dp_arg, steps):
        # one warm call (compile), then timed: budget `steps` inner steps
        chunk_args = lambda s: (
            jnp.asarray(s, jnp.int32), jnp.asarray(1, jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(-np.inf, dtype),
            jnp.asarray(1e-6, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(1e-2, dtype), jnp.asarray(2.0, dtype),
            jnp.asarray(float(n), dtype), jnp.asarray(4, jnp.int32),
        )
        out, _ = run_fn(dp_arg, carry0, *chunk_args(2))
        jax.block_until_ready(out.ic.R)
        t0 = time.time()
        out, _ = run_fn(dp_arg, carry0, *chunk_args(steps))
        jax.block_until_ready(out.ic.R)
        dt = time.time() - t0
        return dt / max(int(out.ic.steps), 1), int(out.ic.steps)

    for kind, A in graphs.items():
        C, As, b = maxcut(A)[:3]
        prob = SDPProblem(C, list(As), np.asarray(b, float), None)
        for nd in (1, 2, 4, 8):
            pad = 128 * nd // math.gcd(128, nd)
            cp = compile_problem(prob, n_shards=nd, row_pad=pad,
                                 nnz_pad=pad)
            n_loc = cp.n_pad // nd
            layouts = [("allgather", False)]
            if nd > 1 and cp.halo_send is not None:
                layouts.append(("halo", True))
            for lname, force in layouts:
                rng = np.random.default_rng(0)
                R0 = np.zeros((cp.n_pad, r), np.float32)
                R0[: cp.n] = rng.uniform(-1, 1, (cp.n, r))
                if nd == 1:
                    dp = to_device(cp, dtype)
                    carry0 = init_major_carry(
                        dp, jnp.asarray(R0), jnp.zeros((cp.m,), dtype),
                        2.0, 2.0 ** -0.1, 1e-6, jax.random.PRNGKey(0),
                        lbfgs_init(k, cp.n_pad, r, dtype), 4,
                        gtol_relative=True, ptol_relative=True,
                    )
                    import functools

                    run_fn = functools.partial(
                        major_chunk, k=k, use_armijo=False,
                        gtol_relative=True, ptol_relative=True,
                        objtol_relative=True, q_max=64,
                        highprecision=False,
                    )
                    per_step, steps = bench_steps(
                        run_fn, carry0, dp, args.steps
                    )
                    comms_words = 0
                else:
                    mesh = Mesh(np.array(jax.devices()[:nd]), (AXIS,))
                    dp_s, specs = shardmap_problem(
                        cp, dtype, mesh, halo=force if force else False
                    )
                    dp1 = to_device(cp, dtype)
                    carry0 = init_major_carry(
                        dp1, jnp.asarray(R0), jnp.zeros((cp.m,), dtype),
                        2.0, 2.0 ** -0.1, 1e-6, jax.random.PRNGKey(0),
                        lbfgs_init(k, cp.n_pad, r, dtype), 4,
                        gtol_relative=True, ptol_relative=True,
                    )
                    run_fn = make_shardmap_major(
                        mesh, specs, k=k, use_armijo=False, q_max=64,
                    )
                    per_step, steps = bench_steps(
                        run_fn, carry0, dp_s, args.steps
                    )
                    comms_words = (
                        (nd - 1) * cp.halo_H * r if force
                        else (cp.n_pad - n_loc) * r
                    )
                rows.append({
                    "kind": kind, "nd": nd, "layout": lname,
                    "n": n, "deg": args.deg,
                    "window": window if kind == "local" else None,
                    "halo_H": cp.halo_H if nd > 1 else 0,
                    "per_step_s": per_step, "steps": steps,
                    "comms_words_per_pass_per_device": comms_words,
                })
                print(json.dumps(rows[-1]))

    out = {
        "commit": repo_commit(),
        "backend": "cpu-virtual-mesh",
        "note": ("time = compute-path scaling on the host mesh; "
                 "comms = exact per-pass word counts per device"),
        "rows": rows,
    }
    path = args.out or os.path.join(
        os.path.dirname(__file__), "output", "scaling_halo.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
