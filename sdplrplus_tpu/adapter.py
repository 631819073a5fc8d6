"""External-model adapter: run the solver on user-supplied operators.

Equivalent of the reference's (disabled) LowRankOpt/NLPModels adapter
(reference: src/lowrankopt.jl:1-135, include commented out at
src/SDPLRPlus.jl:44): there, duck-typed overloads of 𝒜!/𝒜t!/b_vector let
`_sdplr` run against a JuMP-built model. Here a ``CustomModel`` carries
jittable forward/adjoint callables and the core ops dispatch on it, so
the full solver (inner while_loop included) runs unchanged on any model
that can express:

    A_uu(U)        -> (m+1,)  [slot m = <C, UU^T>]
    A_uv(U, V)     -> (m+1,)  values of A((UV^T+VU^T)/2), slot m likewise
    apply_S(y, X)  -> (n_pad, r)  with S = sum_i y_i A_i + y_m C

All callables must be jax-traceable with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CustomModel:
    b: jax.Array
    lam_ub: jax.Array
    vio_lb: jax.Array

    n: int = dataclasses.field(metadata=dict(static=True), default=0)
    m: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_pad: int = dataclasses.field(metadata=dict(static=True), default=0)
    normC: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    normb: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    has_inequalities: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    spmd_axis: str = dataclasses.field(metadata=dict(static=True), default=None)
    fn_A_uu: Callable = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    fn_A_uv: Callable = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    fn_apply_S: Callable = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    @property
    def dtype(self):
        return self.b.dtype


def make_custom_model(
    *, n, b, fn_A_uu, fn_A_uv, fn_apply_S,
    constraint_types=None, normC=1.0, normb=None, dtype=None, n_pad=None
) -> CustomModel:
    import jax.numpy as jnp

    b = np.asarray(b, dtype=np.float64)
    m = b.shape[0]
    ct = (
        np.zeros(m, dtype=bool)
        if constraint_types is None
        else np.asarray(constraint_types, dtype=bool)
    )
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    lam_ub = np.where(ct, 0.0, np.inf)
    vio_lb = np.where(ct, 0.0, -np.inf)
    if normb is None:
        normb = float(np.linalg.norm(b))
    return CustomModel(
        b=jnp.asarray(b, dtype),
        lam_ub=jnp.asarray(lam_ub, dtype),
        vio_lb=jnp.asarray(vio_lb, dtype),
        n=int(n),
        m=m,
        n_pad=int(n_pad if n_pad is not None else n),
        normC=float(normC),
        normb=float(normb),
        has_inequalities=bool(ct.any()),
        fn_A_uu=fn_A_uu,
        fn_A_uv=fn_A_uv,
        fn_apply_S=fn_apply_S,
    )


def dense_model(C: np.ndarray, As, b, constraint_types=None) -> CustomModel:
    """Convenience CustomModel from dense matrices — the analog of running
    the reference through the NLPModels path with dense Jacobian products
    (used for testing the adapter)."""
    import jax.numpy as jnp

    C = np.asarray(C, dtype=np.float64)
    As_np = [np.asarray(A, dtype=np.float64) for A in As]
    n = C.shape[0]
    stack = jnp.asarray(np.stack(As_np + [C]))  # (m+1, n, n)

    def fn_A_uu(U):
        X = U @ U.T
        return jnp.einsum("kij,ij->k", stack.astype(U.dtype), X)

    def fn_A_uv(U, V):
        X = 0.5 * (U @ V.T + V @ U.T)
        return jnp.einsum("kij,ij->k", stack.astype(U.dtype), X)

    def fn_apply_S(y_full, X):
        S = jnp.einsum("k,kij->ij", y_full, stack.astype(y_full.dtype))
        return (S @ X).astype(X.dtype)

    return make_custom_model(
        n=n,
        b=b,
        fn_A_uu=fn_A_uu,
        fn_A_uv=fn_A_uv,
        fn_apply_S=fn_apply_S,
        constraint_types=constraint_types,
        normC=float(np.linalg.norm(C)),
    )
