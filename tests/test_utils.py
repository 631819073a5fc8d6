"""Tests for the auxiliary subsystems: writers round-trip, checkpoint /
warm-start resume, performance profiles, rounding callbacks, IO."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from sdplrplus_tpu import SDPProblem, sdplr
from sdplrplus_tpu.models import make_random_graph, maxcut, minimum_bisection
from sdplrplus_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    warm_start_from,
)
from sdplrplus_tpu.utils.io import load_mat_adjacency, postprocess_graph, read_gset
from sdplrplus_tpu.utils.perfprofile import performance_profile
from sdplrplus_tpu.utils.rounding import (
    eval_cut,
    maxcut_rounding,
    minimum_bisection_rounding,
)
from sdplrplus_tpu.utils.writers import (
    read_problem_sdplr,
    write_initial_solution,
    write_problem_sdpa,
    write_problem_sdplr,
)

from oracles import dense_primal_vio


def test_sdplr_writer_roundtrip(tmp_path):
    A = make_random_graph(8, 0.5, seed=1)
    C, As, b = minimum_bisection(A)  # includes a SymLowRank constraint
    path = str(tmp_path / "prob.sdplr")
    write_problem_sdplr(path, C, As, b)
    C2, As2, b2 = read_problem_sdplr(path)

    p1 = SDPProblem(C, list(As), b, None)
    p2 = SDPProblem(C2, list(As2), b2, None)
    rng = np.random.default_rng(0)
    R = rng.normal(size=(p1.n, 3))
    assert np.allclose(dense_primal_vio(p1, R), dense_primal_vio(p2, R), atol=1e-12)


def test_sdpa_writer_format(tmp_path):
    A = make_random_graph(5, 0.5, seed=2)
    C, As, b = maxcut(A)
    path = str(tmp_path / "prob.sdpa")
    write_problem_sdpa(path, C, As, b)
    lines = open(path).read().strip().splitlines()
    assert lines[0] == "5"   # m
    assert lines[1] == "1"   # blocks
    assert lines[2] == "5"   # block size
    assert len(lines[3].split()) == 5  # b vector


def test_initial_solution_writer(tmp_path):
    R = np.arange(12, dtype=np.float64).reshape(4, 3)
    lam = np.array([1.0, -2.0])
    path = str(tmp_path / "init.sol")
    write_initial_solution(path, R, lam)
    content = open(path).read()
    assert "dual variable 2" in content
    assert "primal variable 1 s 4 3 3" in content


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "ckpt.npz")
    R = np.random.default_rng(0).normal(size=(6, 2))
    lam = np.ones(4)
    save_checkpoint(path, R=R, lam=lam, sigma=4.0, r=2, majoriter=3, total_iter=17)
    st = load_checkpoint(path)
    assert np.allclose(st["R"], R)
    assert st["sigma"] == 4.0 and st["r"] == 2 and st["total_iter"] == 17


def test_warm_start_resume(tmp_path):
    """Solve, checkpoint, resume — the resumed solve must converge fast
    (warm start retains feasibility)."""
    A = make_random_graph(12, 0.5, seed=4)
    C, As, b = maxcut(A)
    res = sdplr(C, As, b, 3, ptol=1e-2, objtol=1e-2,
                prior_trace_bound=12.0, printlevel=0)
    init_func, init_args, r, sigma0 = warm_start_from(res)
    res2 = sdplr(
        C, As, b, r,
        init_func=init_func, init_args=init_args, sigma0=sigma0,
        ptol=1e-2, objtol=1e-2, prior_trace_bound=12.0, printlevel=0,
    )
    assert res2["primal_vio"] <= 1e-2
    assert res2["iter"] <= max(res["iter"], 10)


def test_solver_writes_checkpoints(tmp_path):
    path = str(tmp_path / "solver_ckpt.npz")
    A = make_random_graph(10, 0.5, seed=5)
    C, As, b = maxcut(A)
    sdplr(C, As, b, 3, ptol=1e-3, objtol=1e-3, prior_trace_bound=10.0,
          printlevel=0, checkpoint_path=path, maxmajoriter=50)
    st = load_checkpoint(path)
    assert st["R"].shape[0] == 10


def test_performance_profile():
    T = np.array([[1.0, 2.0], [2.0, 1.0], [1.0, np.inf]])
    taus, rho = performance_profile(T, tau_max=4.0)
    # at tau=1: solver0 best on 2/3 problems, solver1 on 1/3
    assert abs(rho[0, 0] - 2 / 3) < 1e-12
    assert abs(rho[0, 1] - 1 / 3) < 1e-12
    # at tau_max: solver0 wins all, solver1 fails one
    assert rho[-1, 0] == 1.0
    assert abs(rho[-1, 1] - 2 / 3) < 1e-12


def test_rounding_callbacks():
    A = make_random_graph(16, 0.5, seed=6)
    rng = np.random.default_rng(0)
    R = rng.normal(size=(16, 3))
    v = maxcut_rounding(A, R, n_cuts=20)
    # any ±1 cut value is a valid lower bound for maxcut and nonnegative
    assert v >= 0.0
    v2 = minimum_bisection_rounding(A, R, n_cuts=20)
    d = np.asarray(A.sum(axis=1)).reshape(-1)
    L = sp.diags(d) - A
    assert v2 >= 0.0
    # balanced: eval_cut with all-ones (no cut) is 0
    assert eval_cut(L, np.ones(16)) == 0.0


def test_load_mat_v73():
    A = load_mat_adjacency("/root/reference/exps/data/MaxCut/G1.mat")
    assert A.shape == (800, 800)
    assert (abs(A - A.T)).nnz == 0


def test_read_gset(tmp_path):
    path = str(tmp_path / "toy.gset")
    with open(path, "w") as f:
        f.write("3 2\n1 2 1.0\n2 3 2.0\n")
    A = read_gset(path)
    assert A.shape == (3, 3)
    assert A[0, 1] == 1.0 and A[1, 2] == 2.0 and A[1, 0] == 1.0


def test_postprocess_graph():
    A = sp.csr_matrix(np.array([[1.0, 1.0], [0.0, 0.0]]))
    B = postprocess_graph(A)
    assert B[0, 0] == 0.0  # self-loop stripped
    assert B[1, 0] == 1.0  # symmetrized


def test_read_zip_edges(tmp_path):
    """DIMACS10-style zip with <name>_edges.csv (1-based ids, header row)
    (reference: exps/data_preprocess.jl read_zip)."""
    import zipfile

    from sdplrplus_tpu.utils.io import read_zip_edges

    path = tmp_path / "toy.zip"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("toy/toy_edges.csv", "src,dst\n1,2\n2,3\n3,1\n3,3\n")
    A = read_zip_edges(str(path))
    assert A.shape == (3, 3)
    assert A.nnz == 6                      # symmetrized triangle
    assert A.diagonal().sum() == 0         # self-loop stripped
    assert A[0, 1] == 1 and A[1, 0] == 1


def test_read_zip_edges_zero_based(tmp_path):
    import zipfile

    from sdplrplus_tpu.utils.io import read_zip_edges

    path = tmp_path / "toy0.zip"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("toy0_edges.csv", "0,1\n1,2\n")
    A = read_zip_edges(str(path))
    assert A.shape == (3, 3)
    assert A.nnz == 4
