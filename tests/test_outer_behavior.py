"""Outer-loop behavior tests: rank doubling, DIMACS errors, dual bound
quality, result schema stability, config validation."""

import numpy as np
import pytest
import scipy.sparse as sp

from sdplrplus_tpu import SolverConfig, barvinok_pataki, sdplr
from sdplrplus_tpu.models import make_random_graph, maxcut
from sdplrplus_tpu.solver.rank import next_rank


def _cycle(n):
    rows = np.arange(n)
    cols = (rows + 1) % n
    A = sp.csr_matrix((np.ones(n), (rows, cols)), shape=(n, n))
    return A + A.T


def test_barvinok_pataki():
    # min(n, floor(sqrt(2m)+1)) (reference: src/utils.jl:7-9)
    assert barvinok_pataki(100, 8) == 5
    assert barvinok_pataki(3, 1000) == 3
    assert next_rank(2, 100, 8) == 4
    assert next_rank(4, 100, 8) == 5  # capped at BP bound


def test_rank_doubling_triggers():
    """With r=1 the C5 maxcut SDP cannot close the gap (the optimum has
    rank 2); rankupd_tol=1 must trigger rank doubling
    (reference: src/sdplr.jl:347-386)."""
    A = _cycle(5)
    C, As, b = maxcut(A)
    res = sdplr(
        C, As, b, 1,
        ptol=1e-4, objtol=1e-4, rankupd_tol=1,
        prior_trace_bound=5.0, printlevel=0, maxmajoriter=60,
    )
    assert res["r"] > 1
    # with the doubled rank it should reach the gap
    assert res["min_duality_gap"] <= 1e-3


def test_dimacs_errors():
    A = make_random_graph(10, 0.5, seed=1)
    C, As, b = maxcut(A)
    res = sdplr(
        C, As, b, 4,
        ptol=1e-6, objtol=1e-4, prior_trace_bound=10.0,
        printlevel=0, eval_DIMACS_errs=True, maxmajoriter=100,
    )
    errs = res["DIMACS_errs"]
    assert errs.shape == (6,)
    assert errs[0] < 1e-4          # primal feasibility
    assert errs[1] == 0.0 and errs[2] == 0.0  # structural zeros
    assert errs[3] < 1e-2          # -lambda_min(Z) (dual feasibility)
    assert abs(errs[4]) < 1e-2     # duality gap proxy


def test_result_schema_stable():
    A = make_random_graph(6, 0.5, seed=2)
    C, As, b = maxcut(A)
    res = sdplr(C, As, b, 2, ptol=1e-2, objtol=1e-2,
                prior_trace_bound=6.0, printlevel=0)
    for key in [
        "R", "Rt", "lambda", "R0", "Rt0", "lambda0", "sigma", "grad_norm",
        "primal_vio", "obj", "max_dual_value", "min_duality_gap",
        "rel_duality_gap", "totaltime", "dual_time", "dual_lanczos_time",
        "primaltime", "preprocess_time", "iter", "majoriter", "DIMACS_errs",
        "ptol", "objtol", "fprec", "rankupd_tol", "r", "dtype",
    ]:
        assert key in res, key
    assert res["R"].shape == (6, res["r"]) or res["R"].shape[0] == 6
    assert res["Rt"].shape[1] == 6


def test_unknown_kwarg_raises():
    # reference errors on unknown config keys (src/sdplr.jl:102-108)
    A = make_random_graph(5, 0.5, seed=3)
    C, As, b = maxcut(A)
    with pytest.raises(ValueError):
        sdplr(C, As, b, 2, not_a_real_option=1.0)


def test_maxtime_respected():
    A = make_random_graph(40, 0.4, seed=4)
    C, As, b = maxcut(A)
    res = sdplr(
        C, As, b, 4,
        ptol=1e-12, objtol=1e-12, gtol=1e-14, fprec=0.0,
        maxtime=2.0, prior_trace_bound=40.0, printlevel=0,
        inner_chunk=50,
    )
    # must stop within a small multiple of maxtime
    assert res["totaltime"] < 30.0
