"""Multi-host smoke test: the fused shard_map driver over TWO OS
processes (jax.distributed over localhost TCP), checked step-for-step
against a single-process run.

This is the CPU stand-in for a 2-host DCN deployment (real multi-chip
hardware is unavailable here — BASELINE.md measurement plan): each
process exposes 4 virtual CPU devices, the global mesh spans 8, and the
solver state shards exactly as in tests/test_shardmap.py. Marked slow.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["SDPLR_REPO"])

from sdplrplus_tpu.parallel.multihost import initialize, global_mesh

initialize(
    coordinator_address=os.environ["SDPLR_COORD"],
    num_processes=int(os.environ["SDPLR_NPROC"]),
    process_id=int(os.environ["SDPLR_RANK"]),
    local_device_count=4,
    platform="cpu",
)

import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from sdplrplus_tpu import SDPProblem, compile_problem
from sdplrplus_tpu.models import make_random_graph, maxcut
from sdplrplus_tpu.parallel.shardmap import make_shardmap_inner, shardmap_problem
from sdplrplus_tpu.solver.lbfgs import lbfgs_init
from sdplrplus_tpu.solver.al import al_value_grad

nd = jax.device_count()
assert nd == 8, f"expected 8 global devices, got {nd}"
mesh = global_mesh()

A = make_random_graph(48, 0.5, seed=7)
C, As, b = maxcut(A)
prob = SDPProblem(C, list(As), np.asarray(b, float), None)
cp = compile_problem(prob, ell_width=64, n_shards=nd)
dp8, specs = shardmap_problem(cp, jnp.float64, mesh)

r, k = 3, 4
rng = np.random.default_rng(0)
R0 = np.zeros((cp.n_pad, r))
R0[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
R = jax.device_put(jnp.asarray(R0), jax.NamedSharding(mesh, jax.P("x", None)))
lam = jnp.zeros((cp.m,), jnp.float64)
sigma = jnp.asarray(2.0)

import functools
fg = jax.jit(functools.partial(
    al_value_grad, gtol_relative=True, ptol_relative=True))
# replicated single-device reference state for fg seeding
from sdplrplus_tpu.ops.device import to_device
dp1 = to_device(cp, jnp.float64)
L, vio_raw, G, y_full, gn, vn = fg(dp1, jnp.asarray(R0), lam, sigma)

inner = make_shardmap_inner(mesh, specs, k=k, use_armijo=False)
G_sh = jax.device_put(G, jax.NamedSharding(mesh, jax.P("x", None)))
lb = lbfgs_init(k, cp.n_pad, r, jnp.float64)
carry, vio_norm = inner(
    dp8, R, G_sh, y_full, vio_raw, L, gn, lb, lam, sigma,
    jnp.asarray(1e-6), jnp.asarray(-np.inf), jnp.asarray(25, jnp.int32),
)
out = {
    "L": float(carry.L_val),
    "grad_norm": float(carry.grad_norm),
    "steps": int(carry.steps),
    "vio_norm": float(vio_norm),
    # carry.R shards span both processes; reduce it inside jit so the
    # scalar output is replicated and locally addressable
    "R_sum": float(jax.jit(jnp.sum)(carry.R)),
    "process_count": jax.process_count(),
}
if jax.process_index() == 0:
    print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_two_process_shardmap_matches_single_process(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update(
            SDPLR_REPO=REPO,
            SDPLR_COORD=coord,
            SDPLR_NPROC="2",
            SDPLR_RANK=str(rank),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"
    result_line = [
        ln for ln in outs[0][0].splitlines() if ln.startswith("RESULT ")
    ]
    assert result_line, f"no RESULT from coordinator:\n{outs[0][0]}"
    got = json.loads(result_line[0][len("RESULT "):])
    assert got["process_count"] == 2
    assert got["steps"] == 25

    # single-process (8 local virtual devices) reference — same math
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdplrplus_tpu import SDPProblem, compile_problem
    from sdplrplus_tpu.models import make_random_graph, maxcut
    from sdplrplus_tpu.ops.device import to_device
    from sdplrplus_tpu.parallel.shardmap import (
        make_shardmap_inner, shardmap_problem,
    )
    from sdplrplus_tpu.parallel.spmd import make_mesh
    from sdplrplus_tpu.solver.al import al_value_grad
    from sdplrplus_tpu.solver.lbfgs import lbfgs_init

    A = make_random_graph(48, 0.5, seed=7)
    C, As, b = maxcut(A)
    prob = SDPProblem(C, list(As), np.asarray(b, float), None)
    cp = compile_problem(prob, ell_width=64, n_shards=8)
    mesh = make_mesh()
    dp8, specs = shardmap_problem(cp, jnp.float64, mesh)
    r, k = 3, 4
    rng = np.random.default_rng(0)
    R0 = np.zeros((cp.n_pad, r))
    R0[: prob.n] = rng.uniform(-1, 1, size=(prob.n, r))
    lam = jnp.zeros((cp.m,), jnp.float64)
    sigma = jnp.asarray(2.0)
    dp1 = to_device(cp, jnp.float64)
    fg = jax.jit(functools.partial(
        al_value_grad, gtol_relative=True, ptol_relative=True))
    L, vio_raw, G, y_full, gn, vn = fg(dp1, jnp.asarray(R0), lam, sigma)
    inner = make_shardmap_inner(mesh, specs, k=k, use_armijo=False)
    sh = NamedSharding(mesh, P("x", None))
    carry, vio_norm = inner(
        dp8, jax.device_put(jnp.asarray(R0), sh), jax.device_put(G, sh),
        y_full, vio_raw, L, gn, lbfgs_init(k, cp.n_pad, r, jnp.float64),
        lam, sigma,
        jnp.asarray(1e-6), jnp.asarray(-np.inf), jnp.asarray(25, jnp.int32),
    )
    np.testing.assert_allclose(got["L"], float(carry.L_val), rtol=1e-9)
    np.testing.assert_allclose(
        got["grad_norm"], float(carry.grad_norm), rtol=1e-9)
    np.testing.assert_allclose(
        got["R_sum"], float(jnp.sum(jax.device_get(carry.R))), rtol=1e-9)
