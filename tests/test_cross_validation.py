"""Cross-validate solver objectives against an independent dense SDP
method (exps/dense_baseline.py) on small random instances — the in-image
substitute for the reference's external-solver comparisons
(reference: exps/exp_csdp). Target: ≤1% relative objective agreement at
matched feasibility (the BASELINE.md acceptance bar)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "exps"))

from sdplrplus_tpu import sdplr
from sdplrplus_tpu.models import make_random_graph, maxcut, minimum_bisection

from dense_baseline import solve_dense_sdp
from oracles import dense_ops


@pytest.mark.parametrize("n,p,seed", [(12, 0.5, 0), (16, 0.4, 1), (20, 0.6, 2)])
def test_maxcut_obj_matches_dense_baseline(n, p, seed):
    A = make_random_graph(n, p, seed=seed)
    C, As, b = maxcut(A)
    from sdplrplus_tpu.problem import SDPProblem

    prob = SDPProblem(C, list(As), b, None)
    dense = dense_ops(prob)
    obj_ref, vio_ref, _ = solve_dense_sdp(dense[-1], dense[:-1], b)
    assert vio_ref < 1e-6

    res = sdplr(
        C, As, b, 6,
        ptol=1e-4, objtol=1e-3, prior_trace_bound=float(n),
        printlevel=0, maxmajoriter=200,
    )
    rel = abs(res["obj"] - obj_ref) / max(1.0, abs(obj_ref))
    assert rel < 1e-2, (res["obj"], obj_ref)


def test_lovasz_theta_obj_matches_dense_baseline():
    # X = I/n is strictly feasible, so the alternating-projection baseline
    # converges cleanly here (unlike min-bisection's thin intersection).
    from sdplrplus_tpu.models import lovasz_theta
    from sdplrplus_tpu.problem import SDPProblem

    A = make_random_graph(10, 0.5, seed=3)
    C, As, b = lovasz_theta(A)
    prob = SDPProblem(C, list(As), b, None)
    dense = dense_ops(prob)
    obj_ref, vio_ref, _ = solve_dense_sdp(dense[-1], dense[:-1], b)
    assert vio_ref < 1e-6

    res = sdplr(
        C, As, b, 4,
        ptol=1e-4, objtol=1e-3, prior_trace_bound=1.0,
        printlevel=0, maxmajoriter=300,
    )
    rel = abs(res["obj"] - obj_ref) / max(1.0, abs(obj_ref))
    assert rel < 1e-2, (res["obj"], obj_ref)
