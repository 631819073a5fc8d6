"""Probe: how fast can we gather rows of X on this TPU (v5e over tunnel)?

All data is generated ON DEVICE (the tunnel is slow) and each
measurement runs the op K times inside one jitted fori_loop; the rate is
the slope between K=1 and K=KBIG dispatches, which cancels dispatch
latency. Fresh keys per dispatch defeat the backend's dedupe.

Candidates:
  A. XLA jnp.take from HBM (today's path)
  B. Pallas kernel: jnp.take from VMEM-resident X
  C. Pallas kernel: one-hot matmul row-select (MXU), 128-window
  D. XLA one-hot matmul row-select (scan over tiles)
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_000
T = 1 << 19   # rows gathered per op
KBIG = 32


def slope(f, *args):
    """Seconds per op via (t(KBIG) - t(1)) / (KBIG - 1); f(k, key, *args)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    jax.block_until_ready(f(1, k1, *args))   # compile K=1
    jax.block_until_ready(f(KBIG, k1, *args))  # compile KBIG
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    t_small = t_big = np.inf
    for i in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(f(1, keys[2 * i], *args))
        t_small = min(t_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(f(KBIG, keys[2 * i + 1], *args))
        t_big = min(t_big, time.perf_counter() - t0)
    return (t_big - t_small) / (KBIG - 1)


def make_X(r):
    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(7), (N, r), jnp.float32)
    )()


@functools.partial(jax.jit, static_argnums=(0, 3))
def f_xla(k, key, X, r):
    def body(i, acc):
        idx = jax.random.randint(jax.random.fold_in(key, i), (T,), 0, N)
        g = jnp.take(X, idx, axis=0, mode="fill")
        return acc + g[0] + g[-1]
    return lax_fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


def lax_fori(k, body, init):
    return jax.lax.fori_loop(0, k, body, init)


def _pallas_take_call(X, idx, r):
    def kernel(idx_ref, x_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, r), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(idx, X)


@functools.partial(jax.jit, static_argnums=(0, 3))
def f_pallas_take(k, key, X, r):
    def body(i, acc):
        idx = jax.random.randint(jax.random.fold_in(key, i), (T,), 0, N)
        g = _pallas_take_call(X, idx, r)
        return acc + g[0] + g[-1]
    return lax_fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


TT = 512  # nnz tile for the one-hot variants


def _pallas_onehot_call(X, wins, offs, r):
    ntiles = T // TT

    def kernel(w_ref, off_ref, x_ref, o_ref):
        sel = (off_ref[:][:, None] ==
               jax.lax.broadcasted_iota(jnp.int32, (TT, 128), 1))
        o_ref[:] = jnp.dot(sel.astype(jnp.float32), x_ref[:],
                           preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TT,), lambda i, w: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, r), lambda i, w: (w[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, r), lambda i, w: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, r), jnp.float32),
        grid_spec=grid_spec,
    )(wins, offs, X)


@functools.partial(jax.jit, static_argnums=(0, 3))
def f_pallas_onehot(k, key, X, r):
    ntiles = T // TT

    def body(i, acc):
        kk = jax.random.fold_in(key, i)
        wins = jax.random.randint(kk, (ntiles,), 0, N // 128)
        offs = jax.random.randint(jax.random.fold_in(kk, 1), (T,), 0, 128)
        g = _pallas_onehot_call(X, wins, offs, r)
        return acc + g[0] + g[-1]
    return lax_fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


def check_pallas_take(r):
    X = make_X(r)
    idx = jax.random.randint(jax.random.PRNGKey(3), (T,), 0, N)
    got = np.asarray(jax.jit(lambda X, i: _pallas_take_call(X, i, r))(X, idx))
    want = np.asarray(X)[np.asarray(idx)]
    return np.abs(got - want).max()


def main():
    for r in (16, 32):
        X = make_X(r)
        dt = slope(f_xla, X, r)
        print(f"A XLA take        r={r}: {dt/T*1e9:7.3f} ns/row "
              f"({T*r*4/dt/1e9:6.1f} GB/s)", flush=True)
        try:
            err = check_pallas_take(r)
            dt = slope(f_pallas_take, X, r)
            print(f"B pallas take     r={r}: {dt/T*1e9:7.3f} ns/row "
                  f"({T*r*4/dt/1e9:6.1f} GB/s) err={err:.1e}", flush=True)
        except Exception as e:
            print(f"B pallas take     r={r}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        try:
            dt = slope(f_pallas_onehot, X, r)
            print(f"C pallas onehot   r={r}: {dt/T*1e9:7.3f} ns/row "
                  f"({T*r*4/dt/1e9:6.1f} GB/s)", flush=True)
        except Exception as e:
            print(f"C pallas onehot   r={r}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
