"""Halo-exchange SpMM (compile.py halo metadata + ops/spmm.support).

The all-gather row support ships the full (n_pad, r) factor to every
device per operator pass; the halo path exchanges only each shard's
precomputed off-shard column support via lax.ppermute ring shifts
(SURVEY §5 'halo/all-gather for SpMM column support'; BASELINE scaling
target). Equivalence is checked the same way the sharded kernels are
(tests/test_shardmap.py): sharded outputs must equal single-device."""

import math

import numpy as np
import pytest
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sdplrplus_tpu.compile import compile_problem
from sdplrplus_tpu.models.problems import maxcut
from sdplrplus_tpu.ops.adjoint import apply_S, assemble_s_tri
from sdplrplus_tpu.ops.device import to_device
from sdplrplus_tpu.parallel.shardmap import AXIS, shardmap_problem
from sdplrplus_tpu.problem import SDPProblem


def _local_graph(n, deg, window, seed):
    """Ring-local random graph: neighbors within +-window — the locality
    structure real (road/mesh/BFS-reordered) graphs have, where the halo
    is a tiny fraction of n."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), deg)
    offs = rng.integers(1, window + 1, n * deg) * rng.choice(
        [-1, 1], n * deg
    )
    cols = (rows + offs) % n
    A = sp.csr_matrix((np.ones(n * deg), (rows, cols)), shape=(n, n))
    return A.maximum(A.T)


def _compile_pair(n=512, deg=6, window=16, nd=4):
    A = _local_graph(n, deg, window, seed=9)
    C, As, b = maxcut(A)[:3]
    prob = SDPProblem(C, list(As), np.asarray(b, float), None)
    pad = 128 * nd // math.gcd(128, nd)
    cp = compile_problem(prob, n_shards=nd, row_pad=pad, nnz_pad=pad)
    return prob, cp


def test_halo_metadata_built_and_small():
    _, cp = _compile_pair()
    nd = 4
    assert cp.halo_send is not None and cp.halo_send.shape[0] == nd
    # locality ⇒ per-peer halo ≈ window rows, far below the all-gather
    n_loc = cp.n_pad // nd
    assert (nd - 1) * cp.halo_H < 0.5 * (cp.n_pad - n_loc)


def test_halo_remap_consistency():
    """Remapped ELL columns must address exactly the same global rows
    through the [X_local; halo] layout as the raw columns do globally."""
    _, cp = _compile_pair()
    nd = 4
    n_loc = cp.n_pad // nd
    H = cp.halo_H
    for s in range(nd):
        # reconstruct the layout -> global map for shard s
        layout = np.full(n_loc + (nd - 1) * H, -1, dtype=np.int64)
        layout[:n_loc] = np.arange(s * n_loc, (s + 1) * n_loc)
        for t in range(1, nd):
            src = (s - t) % nd
            sends = cp.halo_send[src, t - 1]  # local rows of src
            layout[n_loc + (t - 1) * H: n_loc + t * H] = (
                sends + src * n_loc
            )
        got = layout[cp.halo_ell_cols[s * n_loc:(s + 1) * n_loc]]
        want = cp.ell_cols[s * n_loc:(s + 1) * n_loc]
        assert (got == want).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_halo_apply_S_equivalence():
    prob, cp = _compile_pair()
    nd = 4
    mesh = Mesh(np.array(jax.devices()[:nd]), (AXIS,))
    dp1 = to_device(cp, jnp.float32)

    rng = np.random.default_rng(1)
    lam = rng.normal(size=dp1.m) * 0.1
    y_head = -np.minimum(np.asarray(dp1.lam_ub), lam)
    y_full = jnp.asarray(np.concatenate([y_head, [1.0]]), jnp.float32)
    s_tri = assemble_s_tri(dp1, y_full)
    X = jnp.asarray(rng.normal(size=(dp1.n_pad, 5)), jnp.float32)
    want = apply_S(dp1, s_tri, y_full, X)

    for force in (False, True):
        dp_s, specs = shardmap_problem(cp, jnp.float32, mesh, halo=force)
        if force:
            assert dp_s.halo_send is not None  # halo actually engaged
        row = P(AXIS, None)
        rep = P()
        mapped = jax.jit(jax.shard_map(
            apply_S, mesh=mesh,
            in_specs=(specs, rep, rep, row), out_specs=row,
            check_vma=False,
        ))
        got = mapped(dp_s, s_tri, y_full, X)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_halo_full_solve_equivalence():
    """End-to-end: solve(devices=4) on a locality graph (halo engages by
    the volume rule) must reach the same objective as single-device."""
    from sdplrplus_tpu import SolverConfig
    from sdplrplus_tpu.solver.outer import solve

    A = _local_graph(384, 6, 12, seed=4)
    C, As, b = maxcut(A)[:3]
    prob = SDPProblem(C, list(As), np.asarray(b, float), None)
    cfg = SolverConfig(
        ptol=1e-2, objtol=1e-2, printlevel=0, dtype="float32",
        prior_trace_bound=384.0, maxtime=600.0,
    )
    res1 = solve(prob, 6, cfg)
    res4 = solve(prob, 6, cfg.copy_with(devices=4))
    assert abs(res4["obj"] - res1["obj"]) <= 2e-2 * abs(res1["obj"])
    assert res4["primal_vio"] <= 2e-2
