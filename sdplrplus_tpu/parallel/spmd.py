"""Multi-chip SPMD execution over a jax.sharding.Mesh.

The reference has **no distributed machinery** (SURVEY §2/§5: a
single-process, single-threaded CPU solver); the TPU-native scaling plan
is the one SURVEY §5 derives from the math:

  * shard the n axis of the factor R and of the ELL rows of S,
  * shard the nnz axis of the aggregate pattern / constraint entries,
  * the only cross-device reductions are the ones visible in the math —
    constraint values 𝒜(RRᵀ) (partial segment-sums → psum over nnz
    shards), scalar dots/norms in L-BFGS + line search (psum), and
    Lanczos inner products (psum); the adjoint SpMM needs the column
    support of R (all-gather of the row-sharded factor).

Round-1 implementation: GSPMD. The problem's index arrays are placed
with NamedShardings along a 1-D mesh axis and the exact same jitted
kernels (ops/, solver/inner.py) run SPMD — XLA inserts the psums /
all-gathers listed above. Padding in compile.py is a multiple of 128,
so any device count that divides 128 works without re-padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import CompiledProblem
from ..ops.device import DeviceLowRank, DeviceProblem, to_device

AXIS = "x"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_problem(cp: CompiledProblem, dtype, mesh: Mesh) -> DeviceProblem:
    """Place a compiled problem on the mesh with the SURVEY §5 layout."""
    nd = int(np.prod(mesh.devices.shape))
    for dim, name in [(cp.n_pad, "n_pad"), (cp.P_pad, "P_pad")]:
        if dim % nd != 0:
            raise ValueError(
                f"{name}={dim} not divisible by {nd} devices; recompile the "
                f"problem with row_pad/nnz_pad a multiple of {nd}."
            )

    dp = to_device(cp, dtype)
    s_nnz = NamedSharding(mesh, P(AXIS))          # nnz-axis sharded
    s_row = NamedSharding(mesh, P(AXIS, None))    # row-blocked 2-D
    s_rep = NamedSharding(mesh, P())              # replicated

    def put(x, sh):
        return jax.device_put(x, sh)

    lr = tuple(
        DeviceLowRank(B=put(t.B, s_row), d=put(t.d, s_rep), gid=t.gid)
        for t in dp.lowrank
    )
    # tier-2 rows are grouped per owning shard at compile time; under
    # GSPMD the scatter target is the full row axis, so row-block them
    # when evenly divisible and replicate otherwise
    e2_sh = (NamedSharding(mesh, P(AXIS, None))
             if dp.ell2_rows.shape[0] % nd == 0 and dp.ell2_rows.shape[0] > 0
             else s_rep)
    e2_vec = (NamedSharding(mesh, P(AXIS))
              if dp.ell2_rows.shape[0] % nd == 0 and dp.ell2_rows.shape[0] > 0
              else s_rep)
    con_sh = s_row if dp.con_pos.shape[0] % nd == 0 and dp.con_pos.shape[0] > 0 else s_rep
    return DeviceProblem(
        agg_rows=put(dp.agg_rows, s_nnz),
        agg_cols=put(dp.agg_cols, s_nnz),
        c_val_one=put(dp.c_val_one, s_nnz),
        c_val_two=put(dp.c_val_two, s_nnz),
        con_pos=put(dp.con_pos, con_sh),
        con_rows=put(dp.con_rows, con_sh),
        con_cols=put(dp.con_cols, con_sh),
        con_val_two=put(dp.con_val_two, con_sh),
        wide_val_two=put(dp.wide_val_two, NamedSharding(mesh, P(None, AXIS)) if dp.wide_val_two.shape[0] else s_rep),
        pos_cid=put(dp.pos_cid, s_row),
        pos_val=put(dp.pos_val, s_row),
        cell_val=put(dp.cell_val, s_row),
        cell2_val=put(dp.cell2_val, e2_sh),
        diag_cid=put(dp.diag_cid, s_row),
        diag_w=put(dp.diag_w, s_row),
        ell_cols=put(dp.ell_cols, s_row),
        ell_tri=put(dp.ell_tri, s_row),
        ell2_rows=put(dp.ell2_rows, e2_vec),
        ell2_cols=put(dp.ell2_cols, e2_sh),
        ell2_tri=put(dp.ell2_tri, e2_sh),
        b=put(dp.b, s_rep),
        lam_ub=put(dp.lam_ub, s_rep),
        vio_lb=put(dp.vio_lb, s_rep),
        lowrank=lr,
        C_dense=put(dp.C_dense, s_row) if dp.C_dense is not None else None,
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
        # LS dual-multiplier structure: small (n_pad,) vectors, replicated
        ls_cw=put(dp.ls_cw, s_rep) if dp.ls_cw is not None else None,
        ls_slope_pos=(put(dp.ls_slope_pos, s_rep)
                      if dp.ls_slope_pos is not None else None),
        ls_slope_neg=(put(dp.ls_slope_neg, s_rep)
                      if dp.ls_slope_neg is not None else None),
        ls_gid_pos=(put(dp.ls_gid_pos, s_rep)
                    if dp.ls_gid_pos is not None else None),
        ls_gid_neg=(put(dp.ls_gid_neg, s_rep)
                    if dp.ls_gid_neg is not None else None),
        ls_v_pos=(put(dp.ls_v_pos, s_rep)
                  if dp.ls_v_pos is not None else None),
        ls_v_neg=(put(dp.ls_v_neg, s_rep)
                  if dp.ls_v_neg is not None else None),
        ls_eligible=dp.ls_eligible,
        ls_wide_gid=dp.ls_wide_gid,
    )


def shard_factor(R, mesh: Mesh):
    """Row-shard the factor R (n axis across the mesh)."""
    return jax.device_put(R, NamedSharding(mesh, P(AXIS, None)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
