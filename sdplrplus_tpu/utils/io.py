"""Data ingest: Gset/.mat graph loaders.

Equivalent of the reference's data utilities (reference:
exps/data_utils.jl:1-189, exps/data_preprocess.jl:85-116): MATLAB v7/v7.3
.mat adjacency readers, Gset text format, and graph cleanup
(symmetrize, strip self-loops).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import scipy.sparse as sp


def load_mat_adjacency(path: str, key: str = "A") -> sp.csr_matrix:
    """Load a sparse adjacency matrix from a .mat file (v7 or v7.3/HDF5)."""
    try:
        from scipy.io import loadmat

        d = loadmat(path)
        return sp.csr_matrix(d[key])
    except NotImplementedError:
        import h5py

        with h5py.File(path, "r") as f:
            g = f[key]
            data = np.asarray(g["data"])
            ir = np.asarray(g["ir"], dtype=np.int64)
            jc = np.asarray(g["jc"], dtype=np.int64)
            n = jc.shape[0] - 1
            return sp.csc_matrix((data, ir, jc), shape=(n, n)).tocsr()


def read_gset(path: str) -> sp.csr_matrix:
    """Gset text format: first line "n m", then "i j w" edges (1-based)
    (reference: exps/data_utils.jl read_gset)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        first = f.readline().split()
        n = int(first[0])
        rows, cols, vals = [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            i, j = int(parts[0]) - 1, int(parts[1]) - 1
            w = float(parts[2]) if len(parts) > 2 else 1.0
            rows.append(i)
            cols.append(j)
            vals.append(w)
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    return postprocess_graph(A)


def read_edge_list(path: str, zero_based: bool = True) -> sp.csr_matrix:
    """Plain (optionally gzipped) edge-list reader for SNAP-style files
    (reference: exps/data_utils.jl read_txt_gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    rows, cols = [], []
    with opener(path, "rt") as f:
        for line in f:
            if line.startswith("#") or line.startswith("%"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            i, j = int(parts[0]), int(parts[1])
            if not zero_based:
                i, j = i - 1, j - 1
            rows.append(i)
            cols.append(j)
    n = max(max(rows, default=0), max(cols, default=0)) + 1
    A = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return postprocess_graph(A)


def postprocess_graph(A: sp.spmatrix, largest_component: bool = False) -> sp.csr_matrix:
    """Symmetrize, binarize sign-free weights' duplicates, strip self-loops;
    optionally restrict to the largest connected component
    (reference: exps/data_preprocess.jl postprocess_graph)."""
    A = sp.csr_matrix(A)
    A = A.maximum(A.T)
    A.setdiag(0)
    A.eliminate_zeros()
    if largest_component:
        ncomp, labels = sp.csgraph.connected_components(A, directed=False)
        if ncomp > 1:
            counts = np.bincount(labels)
            keep = np.flatnonzero(labels == counts.argmax())
            A = A[np.ix_(keep, keep)].tocsr()
    return A


def gset_path(name: str, problem: str = "MaxCut",
              root: str = "/root/reference/exps/data") -> str:
    return os.path.join(root, problem, f"{name}.mat")


def pad_to_even(A: sp.spmatrix) -> sp.csr_matrix:
    """Append an isolated dummy node when n is odd — needed by the
    minimum-bisection benchmark (reference: exps/data_preprocess.jl
    dummy-node padding)."""
    A = sp.csr_matrix(A)
    n = A.shape[0]
    if n % 2 == 0:
        return A
    return sp.bmat([[A, sp.csr_matrix((n, 1))],
                    [sp.csr_matrix((1, n)), sp.csr_matrix((1, 1))]]).tocsr()
