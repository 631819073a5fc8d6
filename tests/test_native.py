"""Native C++ host core (native/compiler_core.cpp via utils/native.py):
the ctypes fast path must agree exactly with the numpy fallback, and the
problem compiler must produce identical layouts through either.
"""

import numpy as np
import pytest

from sdplrplus_tpu.utils import native


def _rand_entries(rng, n_entries, n_groups):
    gid = rng.integers(0, n_groups, n_entries).astype(np.int64)
    col = rng.integers(0, 1000, n_entries).astype(np.int32)
    val = rng.standard_normal(n_entries)
    val2 = rng.standard_normal(n_entries)
    return gid, col, val, val2


def test_native_builds():
    assert native.native_available(), "g++ toolchain expected in this image"


@pytest.mark.parametrize("seed", [0, 1])
def test_group_ell_pack_native_matches_numpy(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    gid, col, val, val2 = _rand_entries(rng, 500, 40)

    out_nat = native.group_ell_pack(gid, col, val, 40, fill_col=-7, val2=val2)

    # force the numpy fallback
    monkeypatch.setattr(native, "_lib", lambda: None)
    out_py = native.group_ell_pack(gid, col, val, 40, fill_col=-7, val2=val2)

    for a, b in zip(out_nat, out_py):
        np.testing.assert_array_equal(a, b)


def test_group_ell_pack_width_overflow_counts():
    gid = np.zeros(10, dtype=np.int64)
    col = np.arange(10, dtype=np.int32)
    val = np.arange(10, dtype=np.float64)
    cols, vals, cnt = native.group_ell_pack(gid, col, val, 1, width=4,
                                            fill_col=99)
    assert cnt[0] == 10                      # true count reported
    np.testing.assert_array_equal(cols[0], [0, 1, 2, 3])  # first-come


def test_parse_edges_native_matches_numpy(monkeypatch):
    text = b"# header\n1 2 0.5\n3 4\n% other comment\n\n5 6 -2.25\nbad line\n7 8 1e3\n"
    nat = native.parse_edges(text)
    monkeypatch.setattr(native, "_lib", lambda: None)
    py = native.parse_edges(text)
    for a, b in zip(nat, py):
        np.testing.assert_array_equal(a, b)
    I, J, W = nat
    np.testing.assert_array_equal(I, [1, 3, 5, 7])
    np.testing.assert_array_equal(W, [0.5, 1.0, -2.25, 1000.0])


def test_compiler_identical_with_and_without_native(monkeypatch):
    """compile_problem layouts are byte-identical through the C++ path and
    the numpy fallback (the oracle tests cover numerical correctness)."""
    from sdplrplus_tpu import compile_problem
    from sdplrplus_tpu.models.problems import (
        lovasz_theta, make_random_graph, mu_conductance,
    )
    from sdplrplus_tpu.problem import SDPProblem

    A = make_random_graph(14, 0.5, seed=2)
    for builder in (lovasz_theta, mu_conductance):
        out = builder(A) if builder is lovasz_theta else builder(A, 0.3)
        C, As, b = out[:3]
        ct = out[3] if len(out) > 3 else None
        prob = SDPProblem(C, As, np.asarray(b, np.float64), ct)
        cp_nat = compile_problem(prob)
        monkeypatch.setattr(native, "_lib", lambda: None)
        cp_py = compile_problem(prob)
        monkeypatch.undo()
        for field in ("con_pos", "con_val_two", "pos_cid", "pos_val",
                      "diag_cid", "diag_w", "ell_cols", "ell_tri"):
            np.testing.assert_array_equal(
                getattr(cp_nat, field), getattr(cp_py, field), err_msg=field
            )
