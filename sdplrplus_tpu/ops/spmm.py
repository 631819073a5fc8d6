"""The sparse×dense SpMM kernel: out = M @ X for a static sparse symmetric
matrix M held in two-tier ELL layout, X a dense (n, r) factor.

This is the hot kernel of the whole solver — the TPU counterpart of the
reference's MKLSparse SpMM in the adjoint/gradient path (reference:
src/coreop.jl:260-300) and of its Lanczos matvec (src/coreop.jl:483).

Design (measured on v5e, exps/probe*.py; numbers in docs/DESIGN.md):

  * The layout is two-tier padded ELL — ``cols[n_pad, W]`` /
    ``val[n_pad, W]`` with width-W2 tier-2 rows (scatter-added, chunked)
    for rows whose degree exceeds W. W/W2 are cost-model chosen from the
    degree distribution (compile._choose_ell_widths), so near-regular
    graphs pay ~no padding and power-law graphs don't blow up the width.
    Pad slots point at a guaranteed-zero row so no masking is needed.
  * The compute form is ONE row-gather ``take(X, cols)`` followed by a
    width-contraction einsum. XLA lowers the gather to the hardware
    gather unit at ~2.5-3.6 ns/index with the lane width (r) free up to
    64 lanes — this measured *faster* than every hand-written Pallas
    variant we probed: Mosaic's ``dynamic_gather`` only lowers within a
    single (8,128) vreg tile, per-row DMA gathers crash the Mosaic
    compiler, and a one-hot MXU matmul (1.6 ns/row) is bf16-inexact and
    loses the accuracy budget. The XLA einsum form IS the kernel.
  * The cost is therefore gather-rate bound: ~nnz_full × 3 ns per
    application, independent of r up to 64 lanes. The solver exploits
    exactly that: the fast-diagonal inner path (ops/forward.py /
    solver/inner.py) arranges each inner iteration to issue ONE such
    SpMM (C @ D) and derives everything else — both line-search
    products, the objective slots, and the gradient via the carried
    C@R recurrence — from it with elementwise math.

``spmm_gather`` returns the gathered rows so callers can reuse them
(e.g. a fused sample-and-multiply); ``spmm_ell`` is the plain kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .device import DeviceProblem


def support(dp: DeviceProblem, X: jax.Array) -> jax.Array:
    """The row support the ELL column indices of ``dp`` address.

    Single-device: X itself (global indices). Under shard_map without
    halo metadata: the all-gathered full factor (O(n·r) comms per
    pass). With halo metadata (dp.halo_send set; compile.py halo
    section): [X_local; halo], where the halo carries ONLY the
    precomputed off-shard rows this shard's pattern references —
    exchanged as nd−1 ``lax.ppermute`` ring shifts of (H, r) blocks, so
    comms drop from (n_pad − n_loc)·r to (nd−1)·H·r words per pass.
    ell_cols/ell2_cols are remapped at compile time to address this
    layout, so the gather kernels are unchanged."""
    from .forward import _full

    hs = getattr(dp, "halo_send", None)
    if hs is None or dp.spmd_axis is None:
        return _full(dp, X)
    send = hs[0]                      # (nd-1, H): this shard's lists
    nd = send.shape[0] + 1
    bufs = [X]
    for t in range(1, nd):
        sb = jnp.take(X, send[t - 1], axis=0)
        perm = [(s, (s + t) % nd) for s in range(nd)]
        bufs.append(jax.lax.ppermute(sb, dp.spmd_axis, perm))
    return jnp.concatenate(bufs, axis=0)


def tier2_offset(dp: DeviceProblem):
    """Offset localizing tier-2 global target rows under shard_map:
    axis_index × local-row-count (0 single-device)."""
    if dp.spmd_axis is None:
        return 0
    return jax.lax.axis_index(dp.spmd_axis) * dp.ell_cols.shape[0]


def spmm_gather(X_full: jax.Array, ell_cols: jax.Array) -> jax.Array:
    """Gather step: (n_loc, W) column ids -> (n_loc, W, r) rows of X.

    The single hardware-gather pass everything else is derived from."""
    n_loc, W = ell_cols.shape
    return jnp.take(X_full, ell_cols.reshape(-1), axis=0).reshape(
        n_loc, W, X_full.shape[1]
    )


def spmm_contract(val: jax.Array, Xg: jax.Array) -> jax.Array:
    """Contraction step: (n_loc, W) values × (n_loc, W, r) gathered rows
    -> (n_loc, r)."""
    return jnp.einsum("nw,nwr->nr", val, Xg)


def spmm_tier2(
    out: jax.Array,
    X_full: jax.Array,
    ell2_rows: jax.Array,
    ell2_cols: jax.Array,
    ell2_val: jax.Array,
    local_offset: jax.Array | int = 0,
) -> jax.Array:
    """Add the tier-2 contribution: rows whose degree exceeds the tier-1
    width spill into extra width-W2 ELL rows; each is gathered/contracted
    like tier-1 and scatter-added into its target row. The scatter costs
    ~6× a gather slot per ROW (not per nnz) and tier-2 rows are few, so
    the premium is amortized (see compile._choose_ell_widths).

    ``local_offset``: under shard_map the output rows are the local
    shard; tier-2 target rows are stored globally and grouped by owning
    shard, so the caller passes axis_index·n_local to localize them."""
    contrib = spmm_contract(ell2_val, spmm_gather(X_full, ell2_cols))
    rows = ell2_rows - local_offset
    return out.at[rows].add(contrib)


def spmm_ell(
    X_full: jax.Array,
    ell_cols: jax.Array,
    ell_val: jax.Array,
    ell2_rows: jax.Array | None = None,
    ell2_cols: jax.Array | None = None,
    ell2_val: jax.Array | None = None,
    local_offset: jax.Array | int = 0,
) -> jax.Array:
    """out = M @ X for M in two-tier ELL layout. X_full must carry the
    full column support (all-gathered under shard_map); the output rows
    match the (possibly sharded) ell_cols rows."""
    out = spmm_contract(ell_val, spmm_gather(X_full, ell_cols))
    if ell2_rows is not None and ell2_rows.shape[0] > 0:
        out = spmm_tier2(out, X_full, ell2_rows, ell2_cols, ell2_val,
                         local_offset)
    return out


def spmm_C(dp: DeviceProblem, X: jax.Array) -> jax.Array:
    """C_sparse @ X via the compiled static layout (cell_val carries C's
    values aligned to the ELL slots of the full symmetric aggregate
    pattern; zeros where only constraints have entries).

    Only the *sparse part* of C — low-rank C terms are applied by the
    caller as MXU matmuls. ``X`` is the device-local factor; the row
    support is assembled internally (all-gather or halo exchange,
    ``support``); rows of the result align with dp.ell_cols' rows."""
    X_full = support(dp, X)
    out = spmm_contract(dp.cell_val, spmm_gather(X_full, dp.ell_cols))
    if dp.has_ell2:
        out = spmm_tier2(out, X_full, dp.ell2_rows, dp.ell2_cols,
                         dp.cell2_val, tier2_offset(dp))
    return out
