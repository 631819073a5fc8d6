"""Measured CPU reference baseline: a faithful single-thread numpy/scipy
port of the reference solver's hot loop, used to give ``vs_baseline`` in
bench.py a real denominator.

The reference (SDPLRPlus.jl) is a single-threaded CPU solver — benchmarks
pin BLAS to 1 thread (reference: exps/test.jl:46, exps/README.md:23).
Julia is not installed in this image, so this script re-implements the
reference's exact per-iteration work in numpy/scipy, pinned to 1 thread:

  per inner L-BFGS iteration (reference: src/sdplr.jl:190-246):
    * L-BFGS two-loop direction over (r, n) matrices (src/lbfgs.jl:77-127)
    * exact quartic line search = TWO forward-operator applications
      A((RD'+DR')/2) and A(DD') — each a per-nnz sampled product over the
      aggregate triu pattern plus one SpMV (src/coreop.jl:54-113,
      src/linesearch.jl:8-56) — then closed-form cubic roots
    * algebraic violation commit v += a(a*A_DD + A_RD)
      (src/linesearch.jl:114-126)
    * gradient: assemble S = sum_i y_i A_i + C via SpMV + scatter
      (src/coreop.jl:205-258), then ONE sparse SpMM G = 2 S R
      (src/coreop.jl:260-300, delegated to MKLSparse in the reference;
      scipy.sparse CSR @ dense here — both single-thread CSR row loops)

  outer AL schedule (src/sdplr.jl:310-389): feasible -> Lanczos dual
  bound (src/coreop.jl:376-415,461-514) + dual ascent + tolerance
  tightening ptol /= sigma^0.9, gtol /= sigma; infeasible ->
  sigma *= sigmafac, tolerances reset; duality-gap no-progress counter ->
  rank doubling with restart (src/coreop.jl:516-526).

Run:  python exps/ref_baseline.py --graphs G1,G2,...,G9 --problem MaxCut
Emits one JSON per graph under exps/output/baseline_cpu/ with the same
schema fields bench.py consumes (iter, totaltime, obj, ...).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# single-thread pinning BEFORE numpy import (reference: exps/test.jl:46)
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[_v] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def _load_rowdot():
    """Fused C row-dot kernel (native/rowdot_bench.cpp) standing in for
    the reference's @inbounds @simd `mydot` loop (src/coreop.jl:153-172):
    numpy's R[ti] fancy-indexing materializes both gathered row blocks
    and runs ~6-8x slower on the benchmark shapes (measured,
    exps/output/baseline_cpu/oplevel_bound.json) — using it would
    understate the reference and inflate every vs_baseline figure."""
    import ctypes
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "rowdot_bench.cpp")
    lib = os.path.join(root, "native", "librowdot.so")
    try:
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            subprocess.check_call(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", lib, src])
        dll = ctypes.CDLL(lib)
        dll.rowdot_f64.argtypes = [ctypes.c_void_p] * 5 + [ctypes.c_int64] * 2
        return dll
    except Exception:
        return None


_ROWDOT = _load_rowdot()


def _rowdot(R, D, ti, tj, out):
    """out[p] = <R[ti[p]], D[tj[p]]> via the fused C kernel (numpy
    fallback when the toolchain is unavailable)."""
    if _ROWDOT is not None and R.flags.c_contiguous and D.flags.c_contiguous:
        _ROWDOT.rowdot_f64(R.ctypes.data, D.ctypes.data,
                           ti.ctypes.data, tj.ctypes.data,
                           out.ctypes.data, len(ti), R.shape[1])
        return out
    np.einsum("pr,pr->p", R[ti], D[tj], out=out)
    return out
from scipy.linalg import eigh_tridiagonal

from sdplrplus_tpu.problem import SparseSym, SymLowRank


def _to_scipy(A, n):
    """Model builders return SparseSym/SymLowRank normal forms; keep
    SymLowRank, turn anything sparse into scipy CSR."""
    if isinstance(A, SymLowRank):
        return A
    if isinstance(A, SparseSym):
        return sp.csr_matrix((A.vals, (A.rows, A.cols)), shape=(A.n, A.n))
    return sp.csr_matrix(A)


# --------------------------------------------------------------------------
# preprocessing: aggregate triu pattern + per-constraint value matrices
# (faithful to reference src/preprocess.jl:24-169)
# --------------------------------------------------------------------------

class Prep:
    """Aggregated sparse-constraint preprocessing.

    B_one[(p, k)] = raw value of constraint k at triu slot p (S assembly);
    B_two doubles off-diagonal slots (triu inner products). Column m is C.
    S_struct is the full symmetric CSR pattern whose .data is filled from
    s_tri via data_map each gradient call (the reference's full<->triu
    position map, src/preprocess.jl:120-169).
    """

    def __init__(self, n, C, As):
        mats = list(As) + [C]
        self.m = len(As)
        self.n = n
        self.lowrank = {}  # k -> SymLowRank
        sparse_cols = []
        for k, A in enumerate(mats):
            if isinstance(A, SymLowRank):
                self.lowrank[k] = A
                sparse_cols.append(None)
            else:
                sparse_cols.append(sp.triu(sp.csr_matrix(A)).tocoo())

        # aggregate triu pattern (union)
        ij = set()
        for A in sparse_cols:
            if A is None:
                continue
            ij.update(zip(A.row.tolist(), A.col.tolist()))
        pat = np.array(sorted(ij), dtype=np.int64).reshape(-1, 2)
        self.ti = np.ascontiguousarray(pat[:, 0], dtype=np.int64)
        self.tj = np.ascontiguousarray(pat[:, 1], dtype=np.int64)
        P = len(self.ti)
        self._uvt = np.empty(P)
        self._uvt2 = np.empty(P)
        self.P = P
        pos = {(int(i), int(j)): p for p, (i, j) in enumerate(pat)}

        rows1, cols1, vals1, vals2 = [], [], [], []
        for k, A in enumerate(sparse_cols):
            if A is None:
                continue
            for i, j, v in zip(A.row, A.col, A.data):
                p = pos[(int(i), int(j))]
                rows1.append(p)
                cols1.append(k)
                vals1.append(v)
                vals2.append(v if i == j else 2.0 * v)
        self.B_one = sp.csr_matrix(
            (vals1, (rows1, cols1)), shape=(P, self.m + 1))
        self.B_two_T = sp.csr_matrix(
            (vals2, (cols1, rows1)), shape=(self.m + 1, P))

        # full symmetric structure for S; data_map: full-slot -> triu slot
        off = self.ti != self.tj
        fi = np.concatenate([self.ti, self.tj[off]])
        fj = np.concatenate([self.tj, self.ti[off]])
        fmap = np.concatenate([np.arange(P), np.nonzero(off)[0]])
        S = sp.csr_matrix((np.arange(len(fi), dtype=np.float64) + 1.0,
                           (fi, fj)), shape=(n, n))
        # CSR may have reordered data; recover the permutation
        order = sp.csr_matrix((np.arange(len(fi)), (fi, fj)),
                              shape=(n, n), dtype=np.int64)
        order.sum_duplicates()
        self.S = S
        self.data_map = fmap[np.asarray(order.data, dtype=np.int64)]

    def A_uu(self, R):
        """A(RR') over all constraints + objective slot m (reference:
        src/coreop.jl:72-113, per-nnz dots then one SpMV)."""
        uvt = _rowdot(R, R, self.ti, self.tj, self._uvt)
        out = self.B_two_T @ uvt
        for k, L in self.lowrank.items():
            BR = L.B.T @ R  # (s, r)
            out[k] += float(np.sum(L.d * np.einsum("sr,sr->s", BR, BR)))
        return out

    def A_uv(self, R, D):
        """A(RD' + DR') (reference: src/coreop.jl:115-151,188-203)."""
        uvt = _rowdot(R, D, self.ti, self.tj, self._uvt)
        uvt = uvt + _rowdot(D, R, self.ti, self.tj, self._uvt2)
        out = self.B_two_T @ uvt
        for k, L in self.lowrank.items():
            BR = L.B.T @ R
            BD = L.B.T @ D
            out[k] += 2.0 * float(np.sum(L.d * np.einsum("sr,sr->s", BR, BD)))
        return out

    def assemble_S(self, y):
        """S = sum_k y_k A_k + y_m C: SpMV into triu values then scatter
        through the position map (reference: src/coreop.jl:205-258)."""
        s_tri = self.B_one @ y
        self.S.data = s_tri[self.data_map]
        return self.S

    def apply_S(self, y, R):
        """G_half = S @ R (+ low-rank rank-s updates) — the reference's
        MKLSparse SpMM + mul! updates (src/coreop.jl:260-300)."""
        G = self.assemble_S(y) @ R
        for k, L in self.lowrank.items():
            if y[k] != 0.0:
                G += y[k] * (L.B @ (L.d[:, None] * (L.B.T @ R)))
        return G


# --------------------------------------------------------------------------
# L-BFGS (reference: src/lbfgs.jl)
# --------------------------------------------------------------------------

class LBFGS:
    def __init__(self, k):
        self.k = k
        self.S, self.Y, self.rho = [], [], []

    def clear(self):
        self.S, self.Y, self.rho = [], [], []

    def direction(self, G):
        q = -G.copy()
        al = []
        for s, y, rho in zip(reversed(self.S), reversed(self.Y),
                             reversed(self.rho)):
            a = rho * np.vdot(s, q)
            q -= a * y
            al.append(a)
        for (s, y, rho), a in zip(zip(self.S, self.Y, self.rho),
                                  reversed(al)):
            b = rho * np.vdot(y, q)
            q += (a - b) * s
        return q

    def update(self, s, y):
        sy = np.vdot(s, y)
        if sy <= 1e-30:
            return
        self.S.append(s)
        self.Y.append(y)
        self.rho.append(1.0 / sy)
        if len(self.S) > self.k:
            self.S.pop(0)
            self.Y.pop(0)
            self.rho.pop(0)


# --------------------------------------------------------------------------
# solver (equality path: exact quartic line search)
# --------------------------------------------------------------------------

def exact_linesearch(vio_raw, A_RD, A_DD, lam, sigma, m, alpha_max=1.0):
    """Minimize the quartic AL along alpha (reference:
    src/linesearch.jl:4-127); returns (alpha, new_vio_raw)."""
    p0, p1, p2 = vio_raw[m], A_RD[m], A_DD[m]
    v, q1, q2 = vio_raw[:m], A_RD[:m], A_DD[:m]
    e = p0 - lam @ v + sigma * (v @ v) / 2.0
    d = p1 - lam @ q1 + sigma * (v @ q1)
    c = p2 - (lam - sigma * v) @ q2 + sigma * (q1 @ q1) / 2.0
    b = sigma * (q1 @ q2)
    a = sigma * (q2 @ q2) / 2.0
    # derivative cubic 4a x^3 + 3b x^2 + 2c x + d
    roots = np.roots([4 * a, 3 * b, 2 * c, d]) if a != 0 else (
        np.roots([3 * b, 2 * c, d]) if b != 0 else np.roots([2 * c, d]))
    cands = [alpha_max] + [float(r.real) for r in np.atleast_1d(roots)
                           if abs(r.imag) < 1e-10 and 0 < r.real < alpha_max]
    quart = lambda x: e + x * (d + x * (c + x * (b + x * a)))
    alpha = min(cands, key=quart)
    return alpha, vio_raw + alpha * (alpha * A_DD + A_RD)


def lanczos_min_eig(prep, y, n, q, rng):
    """Randomized Lanczos lower bound on lambda_min(S) (reference:
    src/coreop.jl:461-514) with the residual safeguard theta - beta|s_k|."""
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    alphas, betas = [], []
    v_prev = np.zeros(n)
    beta = 0.0
    for _ in range(q):
        w = prep.apply_S(y, v[:, None])[:, 0]
        a = v @ w
        w -= a * v + beta * v_prev
        alphas.append(a)
        b = np.linalg.norm(w)
        if b < 1e-12:
            betas.append(0.0)
            break
        v_prev, v = v, w / b
        beta = b
        betas.append(b)
    al = np.array(alphas)
    be = np.array(betas[: len(al) - 1])
    theta, vecs = eigh_tridiagonal(al, be, select="i", select_range=(0, 0))
    resid = (be[-1] if len(be) else 0.0) * abs(vecs[-1, 0])
    return float(theta[0]) - float(abs(resid))


def solve_baseline(C, As, b, r, *, ptol=1e-2, objtol=1e-2, sigma0=2.0,
                   sigmafac=2.0, trace_bound=1.0, maxiter=10 ** 7,
                   maxmajoriter=10 ** 5, maxtime=3600.0, rankupd_tol=4,
                   numlbfgsvecs=4, fprec=1e8, seed=0):
    """Faithful port of the reference outer/inner loop
    (src/sdplr.jl:140-449). Equality constraints only."""
    n = C.B.shape[0] if isinstance(C, SymLowRank) else (
        C.n if isinstance(C, SparseSym) else C.shape[0])
    C = _to_scipy(C, n)
    As = [_to_scipy(A, n) for A in As]
    m = len(As)
    rng = np.random.default_rng(seed)

    t_pre = time.time()
    prep = Prep(n, C, As)
    preprocess_time = time.time() - t_pre

    if isinstance(C, SymLowRank):
        normC = float(np.linalg.norm((C.B * C.d) @ C.B.T))
    else:
        normC = float(sp.linalg.norm(C))
    normb = float(np.linalg.norm(b))
    normb = normb if normb > 0 else 1.0

    def fg(R, lam, sigma):
        vals = prep.A_uu(R)
        vio_raw = vals.copy()
        vio_raw[:m] -= b
        v = vio_raw[:m]
        L = vio_raw[m] - lam @ v + sigma * (v @ v) / 2.0
        y = np.concatenate([sigma * v - lam, [1.0]])
        G = 2.0 * prep.apply_S(y, R)
        gn = np.linalg.norm(G) / normC
        vn = np.linalg.norm(v) / normb
        return L, vio_raw, G, gn, vn

    start = time.time()
    R = rng.uniform(-1.0, 1.0, (n, r))
    lam = np.zeros(m)
    sigma = sigma0
    cur_ptol = max(1.0 / sigma ** 0.1, ptol)
    cur_gtol = 1.0 / sigma
    lbfgs = LBFGS(numlbfgsvecs)
    L, vio_raw, G, grad_norm, vio_norm = fg(R, lam, sigma)
    max_dual, min_gap = -np.inf, np.inf
    rank_cnt = rankupd_tol
    total_iter = 0
    majoriter = 0
    dual_time = 0.0
    stag_tol = fprec * np.finfo(np.float64).eps
    timed_out = False

    while majoriter < maxmajoriter:
        majoriter += 1
        # ---- inner L-BFGS loop (src/sdplr.jl:190-278)
        while grad_norm > cur_gtol:
            D = lbfgs.direction(G)
            if not np.isfinite(D).all() or np.vdot(D, G) >= 0:
                D = -G
            A_RD = prep.A_uv(R, D)
            A_DD = prep.A_uu(D)
            L_prev = L
            alpha, vio_raw = exact_linesearch(
                vio_raw, A_RD, A_DD, lam, sigma, m)
            R = R + alpha * D
            G_prev = G
            v = vio_raw[:m]
            L = vio_raw[m] - lam @ v + sigma * (v @ v) / 2.0
            y = np.concatenate([sigma * v - lam, [1.0]])
            G = 2.0 * prep.apply_S(y, R)
            grad_norm = np.linalg.norm(G) / normC
            vio_norm = np.linalg.norm(v) / normb
            total_iter += 1
            lbfgs.update(alpha * D, G - G_prev)
            if abs(L_prev - L) / max(1.0, abs(L_prev)) < stag_tol:
                break
            if total_iter >= maxiter or time.time() - start > maxtime:
                timed_out = True
                break

        if timed_out:
            break

        if vio_norm <= cur_ptol:
            # feasible: dual bound + gap checks (src/sdplr.jl:310-364)
            t_d = time.time()
            q = 2 * int(np.ceil(np.sqrt(max(total_iter, 100)) * np.log(n)))
            y = np.concatenate([sigma * vio_raw[:m] - lam, [1.0]])
            min_eig = lanczos_min_eig(prep, y, n, min(q, n), rng)
            dual = -(y[:m] @ b) + trace_bound * min(min_eig, 0.0)
            dual_time += time.time() - t_d
            max_dual = max(max_dual, dual)
            obj = vio_raw[m]
            denom = min(abs(obj), abs(max_dual))
            gap = (obj - max_dual) / denom if denom > 0 else np.inf
            if vio_norm <= ptol and gap <= objtol:
                min_gap = min(min_gap, gap)
                break
            if min_gap - gap < objtol:
                rank_cnt -= 1
            else:
                rank_cnt = rankupd_tol
            min_gap = min(min_gap, gap)
            lam = lam - sigma * vio_raw[:m]
            cur_ptol = max(cur_ptol / sigma ** 0.9, ptol)
            cur_gtol = cur_gtol / sigma
            if rank_cnt <= 0:
                # rank doubling restart (src/coreop.jl:516-526)
                r = min(2 * r, min(n, int(np.sqrt(2 * m)) + 1))
                R = rng.uniform(-1.0, 1.0, (n, r))
                lbfgs.clear()
                max_dual, min_gap = -np.inf, np.inf
                rank_cnt = rankupd_tol
        else:
            sigma *= sigmafac
            cur_ptol = max(1.0 / sigma ** 0.1, ptol)
            cur_gtol = 1.0 / sigma

        L, vio_raw, G, grad_norm, vio_norm = fg(R, lam, sigma)
        if time.time() - start > maxtime:
            timed_out = True
            break

    totaltime = time.time() - start
    obj = float(vio_raw[m])
    if max_dual > -np.inf:
        denom = min(abs(obj), abs(max_dual))
        rel_gap = (obj - max_dual) / denom if denom > 0 else np.inf
    else:
        rel_gap = np.inf
    return {
        "obj": obj,
        "primal_vio": float(vio_norm),
        "min_duality_gap": float(min_gap),
        "rel_duality_gap": float(rel_gap),
        "grad_norm": float(grad_norm),
        "iter": int(total_iter),
        "majoriter": int(majoriter),
        "totaltime": totaltime + preprocess_time,
        "primaltime": totaltime - dual_time,
        "dual_time": dual_time,
        "preprocess_time": preprocess_time,
        "r": int(r),
        "timed_out": timed_out,
        "al_iters_per_sec": total_iter / max(totaltime - dual_time, 1e-9),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graphs", default="G1")
    p.add_argument("--problem", default="MaxCut",
                   choices=["MaxCut", "LovaszTheta"])
    p.add_argument("--ptol", type=float, default=1e-2)
    p.add_argument("--objtol", type=float, default=1e-2)
    p.add_argument("--rank", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--maxtime", type=float, default=3600.0)
    p.add_argument("--synthetic-n", type=int, default=0)
    p.add_argument("--deg", type=int, default=16)
    args = p.parse_args()

    from sdplrplus_tpu.models import lovasz_theta, maxcut
    from sdplrplus_tpu.utils.io import gset_path, load_mat_adjacency

    outdir = os.path.join(os.path.dirname(__file__), "output", "baseline_cpu",
                          args.problem)
    os.makedirs(outdir, exist_ok=True)

    for graph in args.graphs.split(","):
        if args.synthetic_n:
            rng = np.random.default_rng(1)
            n = args.synthetic_n
            rows = np.repeat(np.arange(n), args.deg)
            cols = rng.integers(0, n, n * args.deg)
            keep = rows != cols
            A = sp.csr_matrix((np.ones(keep.sum()),
                               (rows[keep], cols[keep])), shape=(n, n))
            A = A.maximum(A.T)
            graph = f"RND{n}d{args.deg}"
        else:
            A = load_mat_adjacency(gset_path(graph, problem=args.problem))
        n = A.shape[0]
        if args.problem == "MaxCut":
            C, As, b = maxcut(A)
            tb = float(n)
        else:
            C, As, b = lovasz_theta(A)
            tb = 1.0
        # warmup-free: numpy has no JIT; a tiny run just touches caches
        res = solve_baseline(C, list(As), np.asarray(b, float), args.rank,
                             ptol=args.ptol, objtol=args.objtol,
                             trace_bound=tb, maxtime=args.maxtime,
                             seed=args.seed)
        res.update({"graph": graph, "n": int(n), "problem": args.problem,
                    "solver": "numpy-singlethread-reference-port"})
        path = os.path.join(outdir, f"{graph}.json")
        with open(path, "w") as f:
            json.dump(res, f, indent=1)
        print(json.dumps({k: res[k] for k in (
            "graph", "n", "obj", "primal_vio", "rel_duality_gap", "iter",
            "totaltime", "al_iters_per_sec")}))


if __name__ == "__main__":
    main()
