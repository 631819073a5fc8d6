"""Explicit-collective SPMD: the inner loop under jax.shard_map.

This is the hand-placed-collectives counterpart of the GSPMD path in
``parallel/spmd.py``, implementing exactly the communication pattern
SURVEY §5 derives from the reference's math:

  * the factor R (and the line-search direction) is row-sharded; forward
    sampling all-gathers its column support once per operator application,
  * constraint values: per-shard partial reductions -> psum,
  * scalar dots/norms in L-BFGS, line search and the stagnation test -> psum,
  * the adjoint SpMM consumes the all-gathered factor and produces its
    local output row block with zero further communication.

The ops themselves are the single-device kernels in ops/ — they switch
into SPMD mode through the static ``spmd_axis`` field of DeviceProblem,
so the device-local program is identical to the single-chip one modulo
the collectives. Equivalence vs a single device is tested on an 8-device
CPU mesh (tests/test_shardmap.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import CompiledProblem
from ..ops.device import DeviceLowRank, DeviceProblem, to_device
from ..solver.inner import inner_chunk_impl
from ..solver.lbfgs import LBFGSState

AXIS = "x"


def shardmap_problem(cp: CompiledProblem, dtype, mesh: Mesh,
                     halo: Optional[bool] = None) -> DeviceProblem:
    """Device-local problem shards + the matching PartitionSpec pytree.

    Layout: nnz arrays (aggregate pattern, C values) and row-blocked
    arrays (ELL, diag map, low-rank B) sharded; constraint-level index
    maps and the m-length vectors replicated. Returns (dp_spmd, specs).

    ``halo``: None picks halo-exchange vs all-gather for the SpMM row
    support by comms volume (halo wins when the per-shard off-shard
    support (nd−1)·H is < 75% of the all-gather volume n_pad − n_loc —
    compile.py halo section); True forces halo (error if the compile
    carries no metadata), False forces all-gather.
    """
    nd = int(np.prod(mesh.devices.shape))
    if cp.ell2_rows.shape[0] > 0 and cp.ell2_shards != nd:
        raise ValueError(
            f"tier-2 ELL rows were grouped for {cp.ell2_shards} shard(s) "
            f"but the mesh has {nd} devices; recompile with "
            f"compile_problem(..., n_shards={nd})"
        )
    for dim, name in [(cp.n_pad, "n_pad"), (cp.P_pad, "P_pad")]:
        if dim % nd != 0:
            raise ValueError(f"{name}={dim} not divisible by {nd} devices")

    dp = to_device(cp, dtype)
    dp = dataclasses.replace(dp, spmd_axis=AXIS)

    use_halo = False
    if halo is not False and cp.halo_send is not None:
        if cp.halo_send.shape[0] != nd:
            if halo:
                raise ValueError(
                    f"halo metadata built for {cp.halo_send.shape[0]} "
                    f"shards, mesh has {nd}"
                )
        else:
            n_loc = cp.n_pad // nd
            halo_vol = (nd - 1) * cp.halo_H
            ag_vol = cp.n_pad - n_loc
            use_halo = bool(halo) or halo_vol < 0.75 * ag_vol
    elif halo:
        raise ValueError("halo=True but the compile carries no halo "
                         "metadata (compile_problem(..., n_shards=nd))")
    if use_halo:
        import jax.numpy as jnp

        dp = dataclasses.replace(
            dp,
            ell_cols=jnp.asarray(cp.halo_ell_cols, jnp.int32),
            ell2_cols=jnp.asarray(cp.halo_ell2_cols, jnp.int32),
            halo_send=jnp.asarray(cp.halo_send, jnp.int32),
        )

    nnz = P(AXIS)
    row = P(AXIS, None)
    rep = P()
    specs = DeviceProblem(
        agg_rows=nnz,
        agg_cols=nnz,
        c_val_one=rep,      # assemble_s_tri runs replicated (general path)
        c_val_two=nnz,      # objective partial dot is nnz-sharded
        con_pos=rep,
        con_rows=rep,
        con_cols=rep,
        con_val_two=rep,
        wide_val_two=P(None, AXIS),
        pos_cid=rep,
        pos_val=rep,
        cell_val=row,
        cell2_val=row,
        diag_cid=row,
        diag_w=row,
        ell_cols=row,
        ell_tri=row,
        ell2_rows=P(AXIS),
        ell2_cols=row,
        ell2_tri=row,
        halo_send=P(AXIS, None, None) if use_halo else None,
        b=rep,
        lam_ub=rep,
        vio_lb=rep,
        lowrank=tuple(
            DeviceLowRank(B=row, d=rep, gid=t.gid) for t in dp.lowrank
        ),
        C_dense=row if dp.C_dense is not None else None,
        # entrywise dense-mask mode: masks and the dense C row-shard; the
        # per-entry index triples and the extras weights row-localize
        # inside the kernels (ops/entrymask.py _scatter_sym/_row_offset)
        entry_gids=rep if dp.entry_gids is not None else None,
        entry_rows=rep if dp.entry_rows is not None else None,
        entry_cols=rep if dp.entry_cols is not None else None,
        ew_c2=row if dp.ew_c2 is not None else None,
        ew_v1=row if dp.ew_v1 is not None else None,
        ew_h=row if dp.ew_h is not None else None,
        ew_C=row if dp.ew_C is not None else None,
        entry_cpen=rep if dp.entry_cpen is not None else None,
        entry_csgn=rep if dp.entry_csgn is not None else None,
        extra_wide_w=(P(None, AXIS) if dp.extra_wide_w is not None
                      else None),
        extra_gids=dp.extra_gids,
        wide_diag_w=P(None, AXIS),
        # LS dual-multiplier structure: small (n_pad,) vectors, replicated
        # (ls_dual_head gathers the row-local w to full before using them)
        ls_cw=rep if dp.ls_cw is not None else None,
        ls_slope_pos=rep if dp.ls_slope_pos is not None else None,
        ls_slope_neg=rep if dp.ls_slope_neg is not None else None,
        ls_gid_pos=rep if dp.ls_gid_pos is not None else None,
        ls_gid_neg=rep if dp.ls_gid_neg is not None else None,
        ls_v_pos=rep if dp.ls_v_pos is not None else None,
        ls_v_neg=rep if dp.ls_v_neg is not None else None,
        ls_eligible=dp.ls_eligible,
        ls_wide_gid=dp.ls_wide_gid,
        entry_trace_cert=dp.entry_trace_cert,
        trC_n=dp.trC_n,
        entry_mix_c=dp.entry_mix_c,
        n=dp.n,
        m=dp.m,
        n_pad=dp.n_pad,
        P_pad=dp.P_pad,
        ell_width=dp.ell_width,
        con_width=dp.con_width,
        pos_width=dp.pos_width,
        diag_width=dp.diag_width,
        all_cons_diagonal=dp.all_cons_diagonal,
        wide_gids=dp.wide_gids,
        has_ell2=dp.has_ell2,
        ell2_width=dp.ell2_width,
        ell2_shards=dp.ell2_shards,
        has_inequalities=dp.has_inequalities,
        normC=dp.normC,
        normb=dp.normb,
        diag_identity=dp.diag_identity,
        spmd_axis=AXIS,
    )

    # place the data according to the specs
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    dp_placed = jax.tree_util.tree_map(put, dp, specs)
    return dp_placed, specs


def make_shardmap_inner(mesh: Mesh, specs: DeviceProblem, *, k: int,
                        use_armijo: bool, gtol_relative: bool = True,
                        ptol_relative: bool = True):
    """shard_map-wrapped inner_chunk with explicit collectives.

    Returns f(dp, R, G, y_full, vio_raw, L, grad_norm, lbfgs, lam, sigma,
    cur_gtol, stag_tol, max_steps) -> (carry, vio_norm) where R/G/lbfgs
    histories are row-sharded and everything else replicated.
    """
    row = P(AXIS, None)
    rep = P()
    lbfgs_spec = LBFGSState(
        s_hist=P(None, AXIS, None),
        y_hist=P(None, AXIS, None),
        rho=rep,
        head=rep,
        sty=rep,
        yty=rep,
    )
    from ..ops.device import fast_diag_eligible
    from ..solver.inner import InnerCarry

    carry_spec = InnerCarry(
        R=row, G=row, y_full=rep, vio_raw=rep, L_val=rep, grad_norm=rep,
        lbfgs=lbfgs_spec, steps=rep, stagnated=rep,
        CX=row if fast_diag_eligible(specs) else None,
    )
    in_specs = (
        specs, row, row, rep, rep, rep, rep, lbfgs_spec,
        rep, rep, rep, rep, rep,
    )
    out_specs = (carry_spec, rep)

    fn = functools.partial(
        inner_chunk_impl,
        k=k, use_armijo=use_armijo,
        gtol_relative=gtol_relative, ptol_relative=ptol_relative,
    )
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def make_shardmap_major(mesh: Mesh, specs: DeviceProblem, *, k: int,
                        use_armijo: bool, q_max: int,
                        gtol_relative: bool = True,
                        ptol_relative: bool = True,
                        objtol_relative: bool = True,
                        highprecision: bool = False,
                        lbfgs_compact: bool = True,
                        dual_safeguard: bool = True,
                        blk_b: int = 0, blk_kmax: int = 0,
                        blk_margin_frac: float = 0.25,
                        blk_k_min: int = 4):
    """shard_map-wrapped FUSED outer driver (solver/major.major_chunk_impl):
    the full major-iteration state machine — inner L-BFGS loop, Lanczos
    dual bound (row-sharded Krylov vectors, psum'd recurrences), dual
    ascent, σ/tolerance schedule — as one SPMD program with explicit
    collectives.

    Returns f(dp, carry, budget, major_budget, base_iter, stag_tol,
    ptol_final, gtol_final, objtol, sigmafac, trace_bound, rankupd_tol)
    -> (carry, vio_norm); R/G/L-BFGS histories row-sharded, everything
    else replicated.
    """
    from ..ops.device import fast_diag_eligible
    from ..solver.inner import InnerCarry
    from ..solver.major import MajorCarry, major_chunk_impl

    row = P(AXIS, None)
    rep = P()
    lbfgs_spec = LBFGSState(
        s_hist=P(None, AXIS, None), y_hist=P(None, AXIS, None),
        rho=rep, head=rep, sty=rep, yty=rep,
    )
    ic_spec = InnerCarry(
        R=row, G=row, y_full=rep, vio_raw=rep, L_val=rep, grad_norm=rep,
        lbfgs=lbfgs_spec, steps=rep, stagnated=rep,
        CX=row if fast_diag_eligible(specs) else None,
    )
    carry_spec = MajorCarry(
        ic=ic_spec, lam=rep, sigma=rep, cur_ptol=rep, cur_gtol=rep,
        key=rep, best_lam=rep, max_dual=rep, min_gap=rep, last_gap=rep,
        rankupd_cnt=rep, majoriters=rep, converged=rep, rank_double=rep,
        feas_count=rep, dual_passes=rep,
    )
    in_specs = (specs, carry_spec) + (rep,) * 10
    out_specs = (carry_spec, rep)

    fn = functools.partial(
        major_chunk_impl,
        k=k, use_armijo=use_armijo, gtol_relative=gtol_relative,
        ptol_relative=ptol_relative, objtol_relative=objtol_relative,
        q_max=q_max, highprecision=highprecision,
        lbfgs_compact=lbfgs_compact, dual_safeguard=dual_safeguard,
        blk_b=blk_b, blk_kmax=blk_kmax,
        blk_margin_frac=blk_margin_frac, blk_k_min=blk_k_min,
    )
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)
