"""DeviceProblem: the compiled problem as a jit-friendly pytree.

Array leaves live on device; dimensions and layout metadata are static
aux data so every operator specializes once per problem shape.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import CompiledProblem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceLowRank:
    B: jax.Array  # (n_pad, s)
    d: jax.Array  # (s,)
    gid: int = dataclasses.field(metadata=dict(static=True), default=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceProblem:
    # -- array leaves ---------------------------------------------------------
    agg_rows: jax.Array
    agg_cols: jax.Array
    c_val_one: jax.Array
    c_val_two: jax.Array
    con_pos: jax.Array
    con_rows: jax.Array
    con_cols: jax.Array
    con_val_two: jax.Array
    wide_val_two: jax.Array
    pos_cid: jax.Array
    pos_val: jax.Array
    cell_val: jax.Array
    cell2_val: jax.Array
    diag_cid: jax.Array
    diag_w: jax.Array
    ell_cols: jax.Array
    ell_tri: jax.Array
    ell2_rows: jax.Array
    ell2_cols: jax.Array
    ell2_tri: jax.Array
    b: jax.Array
    lam_ub: jax.Array
    vio_lb: jax.Array
    lowrank: Tuple[DeviceLowRank, ...]
    # dense MXU mode: C as a dense (n_pad, n_pad) matrix (None on the
    # sparse/gather path); see compile.py dense-mode selection
    C_dense: jax.Array = None
    # entrywise dense-mask mode (ops/entrymask.py); all None when the
    # mode was not compiled in (compile.py entry-mode selection)
    entry_gids: jax.Array = None   # (m_e,)
    entry_rows: jax.Array = None   # (m_e,)
    entry_cols: jax.Array = None   # (m_e,)
    ew_c2: jax.Array = None        # (n_pad, n_pad)
    ew_v1: jax.Array = None        # (n_pad, n_pad)
    ew_h: jax.Array = None         # (n_pad, n_pad)
    ew_C: jax.Array = None         # (n_pad, n_pad) dense C (None: C low-rank)
    entry_cpen: jax.Array = None   # (m_e,) per-entry violation penalty
    entry_csgn: jax.Array = None   # (m_e,) signed ⟨C,E⟩ weight
    extra_wide_w: jax.Array = None  # (n_exw, n_pad)
    # fast-diagonal SpMM path: wide diagonal constraints' weights as dense
    # row-aligned rows (see compile.py); (0, n_pad) when no wide constraints
    wide_diag_w: jax.Array = None  # (n_wide, n_pad)
    # generalized LS dual multiplier structure (compile.py
    # _compile_ls_structure, solver/dualbound.ls_dual_head); all None when
    # ls_eligible is False
    ls_cw: jax.Array = None         # (n_pad,)
    ls_slope_pos: jax.Array = None  # (n_pad,)
    ls_slope_neg: jax.Array = None  # (n_pad,)
    ls_gid_pos: jax.Array = None    # (n_pad,) int32 (m = no channel)
    ls_gid_neg: jax.Array = None    # (n_pad,)
    ls_v_pos: jax.Array = None      # (n_pad,)
    ls_v_neg: jax.Array = None      # (n_pad,)
    # halo-exchange SpMM (ops/spmm.support): per-peer send row lists,
    # (nd, nd-1, H) row-sharded; non-None ⇒ ell_cols/ell2_cols are
    # remapped into the [X_local; halo] layout (parallel/shardmap.py)
    halo_send: jax.Array = None

    # -- static metadata ------------------------------------------------------
    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    m: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    P_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    ell_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    con_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    pos_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    diag_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    all_cons_diagonal: bool = dataclasses.field(metadata=dict(static=True), default=False)
    wide_gids: tuple = dataclasses.field(metadata=dict(static=True), default=())
    extra_gids: tuple = dataclasses.field(metadata=dict(static=True), default=())
    # when set, the ops run inside shard_map over this mesh axis: factors
    # and nnz arrays are device-local shards; scalar reductions psum and
    # the factor row support is all-gathered (SURVEY §5 collectives)
    spmd_axis: str = dataclasses.field(metadata=dict(static=True), default=None)
    has_ell2: bool = dataclasses.field(metadata=dict(static=True), default=False)
    ell2_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    ell2_shards: int = dataclasses.field(metadata=dict(static=True), default=1)
    has_inequalities: bool = dataclasses.field(metadata=dict(static=True), default=False)
    normC: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    normb: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    # constraint i is exactly X_ii (MaxCut/CutNorm shape): enables the
    # closed-form least-squares dual estimate (solver/major.py dual_bound)
    diag_identity: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # generalized LS dual multiplier applies (superset of diag_identity;
    # compile.py _compile_ls_structure)
    ls_eligible: bool = dataclasses.field(metadata=dict(static=True), default=False)
    ls_wide_gid: int = dataclasses.field(metadata=dict(static=True), default=-1)
    # entry-mode certified objective applies (compile.py; one wide
    # nonnegative-diag b>0 extra constraint, no low-rank extras)
    entry_trace_cert: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # trace(C)/n — objective of the feasible point I/n (entry certificate)
    trC_n: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    # c of the entry-certificate mix point X_I = c·I (c = b_w/Σw)
    entry_mix_c: float = dataclasses.field(metadata=dict(static=True), default=0.0)

    @property
    def dtype(self):
        return self.b.dtype


def fast_diag_eligible(dp) -> bool:
    """Whether the fast-diagonal single-SpMM inner path applies: every
    sparse-constraint entry on the diagonal (S = C + diag(w·y) + lowrank),
    no dense-MXU / entrywise mode compiled in, no external-model adapter.

    Works on both a real DeviceProblem and a PartitionSpec pytree of one
    (only static fields and leaf presence are consulted), so the shard_map
    spec builders can call it too."""
    return bool(
        getattr(dp, "all_cons_diagonal", False)
        and getattr(dp, "C_dense", None) is None
        and getattr(dp, "ew_c2", None) is None
        and getattr(dp, "fn_apply_S", None) is None
        and getattr(dp, "fn_A_uu", None) is None
    )


def _diag_identity(cp: CompiledProblem) -> bool:
    """True when constraint i is exactly X_ii (weight 1, bijection with the
    first m rows) — MaxCut/CutNorm-shaped. Enables the closed-form
    least-squares dual estimate in the dual bound (solver/major.py):
    y minimizing ‖S(y)·R‖ is then y_i = -⟨(CR)_i, R_i⟩/‖R_i‖²."""
    n, m = cp.n, cp.m
    if not cp.all_cons_diagonal or cp.wide_gids or cp.diag_width != 1:
        return False
    if m != n or any(t.gid != m for t in cp.lowrank):
        return False
    cid = np.asarray(cp.diag_cid)[:n, 0]
    w = np.asarray(cp.diag_w)[:n, 0]
    return bool((cid == np.arange(n)).all() and (w == 1.0).all())


def to_device(cp: CompiledProblem, dtype) -> DeviceProblem:
    dtype = jnp.dtype(dtype)
    f = lambda x: jnp.asarray(np.asarray(x), dtype=dtype)
    i = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.int32)
    lr = tuple(
        DeviceLowRank(B=f(t.B), d=f(t.d), gid=t.gid) for t in cp.lowrank
    )
    # lam_ub / vio_lb carry +-inf — representable in f32/f64 alike
    return DeviceProblem(
        agg_rows=i(cp.agg_rows),
        agg_cols=i(cp.agg_cols),
        c_val_one=f(cp.c_val_one),
        c_val_two=f(cp.c_val_two),
        con_pos=i(cp.con_pos),
        con_rows=i(cp.con_rows),
        con_cols=i(cp.con_cols),
        con_val_two=f(cp.con_val_two),
        wide_val_two=f(cp.wide_val_two),
        pos_cid=i(cp.pos_cid),
        pos_val=f(cp.pos_val),
        cell_val=f(cp.cell_val),
        cell2_val=f(cp.cell2_val),
        diag_cid=i(cp.diag_cid),
        diag_w=f(cp.diag_w),
        ell_cols=i(cp.ell_cols),
        ell_tri=i(cp.ell_tri),
        ell2_rows=i(cp.ell2_rows),
        ell2_cols=i(cp.ell2_cols),
        ell2_tri=i(cp.ell2_tri),
        b=f(cp.b),
        lam_ub=f(cp.lam_ub),
        vio_lb=f(cp.vio_lb),
        lowrank=lr,
        C_dense=f(cp.C_dense) if cp.C_dense is not None else None,
        entry_gids=i(cp.entry_gids) if cp.entry_gids is not None else None,
        entry_rows=i(cp.entry_rows) if cp.entry_rows is not None else None,
        entry_cols=i(cp.entry_cols) if cp.entry_cols is not None else None,
        ew_c2=f(cp.ew_c2) if cp.ew_c2 is not None else None,
        ew_v1=f(cp.ew_v1) if cp.ew_v1 is not None else None,
        ew_h=f(cp.ew_h) if cp.ew_h is not None else None,
        ew_C=f(cp.ew_C) if cp.ew_C is not None else None,
        entry_cpen=f(cp.entry_cpen) if cp.entry_cpen is not None else None,
        entry_csgn=f(cp.entry_csgn) if cp.entry_csgn is not None else None,
        extra_wide_w=(
            f(cp.extra_wide_w) if cp.extra_wide_w is not None else None
        ),
        wide_diag_w=(
            f(cp.wide_diag_w) if cp.wide_diag_w is not None
            else f(np.zeros((0, cp.n_pad)))
        ),
        ls_cw=f(cp.ls_cw) if cp.ls_cw is not None else None,
        ls_slope_pos=(
            f(cp.ls_slope_pos) if cp.ls_slope_pos is not None else None
        ),
        ls_slope_neg=(
            f(cp.ls_slope_neg) if cp.ls_slope_neg is not None else None
        ),
        ls_gid_pos=i(cp.ls_gid_pos) if cp.ls_gid_pos is not None else None,
        ls_gid_neg=i(cp.ls_gid_neg) if cp.ls_gid_neg is not None else None,
        ls_v_pos=f(cp.ls_v_pos) if cp.ls_v_pos is not None else None,
        ls_v_neg=f(cp.ls_v_neg) if cp.ls_v_neg is not None else None,
        ls_eligible=bool(cp.ls_eligible),
        ls_wide_gid=int(cp.ls_wide_gid),
        entry_trace_cert=bool(cp.entry_trace_cert),
        trC_n=float(cp.trC_n),
        entry_mix_c=float(cp.entry_mix_c),
        extra_gids=tuple(cp.extra_gids),
        n=cp.n,
        m=cp.m,
        n_pad=cp.n_pad,
        P_pad=cp.P_pad,
        ell_width=cp.ell_width,
        con_width=cp.con_width,
        pos_width=cp.pos_width,
        diag_width=cp.diag_width,
        all_cons_diagonal=cp.all_cons_diagonal,
        wide_gids=tuple(cp.wide_gids),
        has_ell2=cp.ell2_rows.shape[0] > 0,
        ell2_width=cp.ell2_width,
        ell2_shards=cp.ell2_shards,
        has_inequalities=cp.has_inequalities,
        normC=float(cp.normC),
        normb=float(cp.normb),
        diag_identity=_diag_identity(cp),
    )
