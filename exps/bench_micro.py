"""Kernel micro-benchmarks: per-op device timing for the hot operators.

Equivalent of the reference's micro-benchmarks (reference:
exps/bench.jl:1-122, which @btime's 𝒜!/𝒜t! variants). Times each jitted
kernel inside a fori_loop (amortizing dispatch) with input perturbation
per iteration so a caching backend cannot dedupe the work.

    python exps/bench_micro.py --graph G1 [--synthetic-n 100000 --deg 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="G1")
    p.add_argument("--synthetic-n", type=int, default=0,
                   help="use a random regular-ish graph of this size instead")
    p.add_argument("--deg", type=int, default=16)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import scipy.sparse as sp

    from sdplrplus_tpu import SDPProblem, compile_problem
    from sdplrplus_tpu.models import maxcut
    from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri, gradient
    from sdplrplus_tpu.ops.device import to_device
    from sdplrplus_tpu.ops.forward import A_linesearch, A_uu
    from sdplrplus_tpu.solver.lbfgs import lbfgs_init, lbfgs_direction
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    if args.synthetic_n:
        n = args.synthetic_n
        rng = np.random.default_rng(0)
        rows = np.repeat(np.arange(n), args.deg)
        cols = rng.integers(0, n, n * args.deg)
        keep = rows != cols
        A = sp.csr_matrix(
            (np.ones(keep.sum()), (rows[keep], cols[keep])), shape=(n, n)
        )
        A = A.maximum(A.T)
    else:
        A = load_mat_adjacency(gset_path(args.graph))

    C, As, b = maxcut(A)
    prob = SDPProblem(C, list(As), b, None)
    cp = compile_problem(prob)
    dp = to_device(cp, jnp.dtype(args.dtype))
    r = args.rank
    rng = np.random.default_rng(0)
    R = jnp.asarray(
        np.pad(rng.uniform(-1, 1, (cp.n, r)), ((0, cp.n_pad - cp.n), (0, 0))),
        dp.dtype,
    )
    D = jnp.asarray(
        np.pad(rng.uniform(-1, 1, (cp.n, r)), ((0, cp.n_pad - cp.n), (0, 0))),
        dp.dtype,
    )
    lam = jnp.zeros((cp.m,), dp.dtype)
    sigma = jnp.asarray(2.0, dp.dtype)
    y_full = jnp.concatenate([lam, jnp.ones(1, dp.dtype)])
    vio = jnp.zeros((cp.m + 1,), dp.dtype)
    lb = lbfgs_init(4, cp.n_pad, r, dp.dtype)
    N = args.iters

    nnz_full = 2 * cp.P - cp.n  # approx; diag counted once
    spmm_flops = 2 * nnz_full * r

    def bench(name, fn, x0, flops=0):
        @jax.jit
        def run(x):
            return lax.fori_loop(0, N, lambda i, x: fn(x), x)
        jax.block_until_ready(run(x0))
        t0 = time.time()
        jax.block_until_ready(run(x0))
        dt = (time.time() - t0) / N
        gf = f"  {flops / dt / 1e9:8.1f} GFLOP/s" if flops else ""
        print(f"{name:22s} {dt*1e6:9.1f} us{gf}")

    eps = jnp.finfo(dp.dtype).eps
    bench("A_uu", lambda x: A_uu(dp, R * (1 + eps * x[0])), jnp.zeros((cp.m + 1,), dp.dtype))
    bench("A_linesearch", lambda x: A_linesearch(dp, R * (1 + eps * x[0]), D)[0],
          jnp.zeros((cp.m + 1,), dp.dtype))
    bench("gradient(SpMM)", lambda x: gradient(dp, R * (1 + eps * x[0, 0]), lam, sigma, vio)[0],
          R * 0, flops=2 * spmm_flops)
    if not dp.all_cons_diagonal:
        bench("assemble_s_tri", lambda x: assemble_s_tri(dp, y_full * (1 + eps * x[0])),
              jnp.zeros((cp.P_pad,), dp.dtype))
    bench("lbfgs_direction", lambda x: lbfgs_direction(lb, x, 4), R + 0.0)
    print(f"n={cp.n} n_pad={cp.n_pad} P={cp.P} W={cp.ell_width} "
          f"nnz_full~{nnz_full} r={r} dtype={dp.dtype}")


if __name__ == "__main__":
    main()
