"""Probe 3: which in-kernel gather forms does Mosaic lower, and how fast?

Candidates (all with X resident in VMEM):
  lane-gather   jnp.take_along_axis(x, idx, axis=1) on (sub, 128·k) tiles
  sublane-take  jnp.take(x, idx, axis=0) on a (128, r) tile
  full-take     jnp.take(X, idx, axis=0) on the whole (N, r) VMEM array
  ds-loop       per-entry dynamic-slice row copies
Plus dtype effects on the XLA HBM row-take (f32 vs bf16).
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
T = 1 << 19


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def rate(f, K, *args):
    fetch(f(K // 2, *args))
    fetch(f(K, *args))
    t_half = t_full = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(f(K // 2, *args))
        t_half = min(t_half, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetch(f(K, *args))
        t_full = min(t_full, time.perf_counter() - t0)
    return (t_full - t_half) / (K - K // 2)


def fori(k, body, init):
    return jax.lax.fori_loop(0, k, body, init)


# ---- 1. lane gather: out[s, l] = x[s, idx[s, l]] on (SUB, LANES) tiles ----
def _lane_gather_call(Xt, idx, sub, lanes):
    """Xt: (sub, lanes) value tile; idx: (sub, lanes) in [0, lanes)."""
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((sub, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(Xt, idx)


# grid version: out block t = take_along_axis(x_block_t, idx_block_t)
def _lane_gather_grid(Xbig, idxbig, sub, lanes, ntiles):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        out_shape=jax.ShapeDtypeStruct((sub * ntiles, lanes), jnp.float32),
        in_specs=[
            pl.BlockSpec((sub, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sub, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(Xbig, idxbig)


# ---- 2. sublane take: out = x[idx, :] on a (rows, r) tile -----------------
def _sublane_take_call(Xt, idx, rows, out_rows, r):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[0], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, r), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(Xt, idx.reshape(1, -1))


# ---- 3. whole-array take in one kernel ------------------------------------
def _full_take_call(X, idx, r):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[0], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], r), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(X, idx.reshape(1, -1))


def try_case(name, fn, check_fn, timer=None, K=32):
    try:
        got = fn()
        err = check_fn(np.asarray(got))
        msg = f"{name}: OK err={err:.1e}"
        if timer is not None:
            dt = timer()
            msg += f"  {dt}"
        print(msg, flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # 1. lane gather on one (8, 512) tile
    for sub, lanes in ((8, 128), (8, 512), (16, 512), (8, 2048), (32, 1024)):
        Xt = jax.random.normal(key, (sub, lanes), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, 1), (sub, lanes),
                                 0, lanes)
        want = np.take_along_axis(np.asarray(Xt), np.asarray(idx), axis=1)
        try_case(
            f"lane-gather ({sub},{lanes})",
            lambda Xt=Xt, idx=idx, sub=sub, lanes=lanes:
                jax.jit(lambda a, b: _lane_gather_call(a, b, sub, lanes))(Xt, idx),
            lambda got, want=want: np.abs(got - want).max(),
        )

    # grid lane-gather throughput: big array, many tiles
    sub, lanes = 8, 1024
    ntiles = T // lanes  # entries = ntiles * lanes (per sublane row)
    Xbig = jax.random.normal(key, (sub * ntiles, lanes), jnp.float32)
    idxbig = jax.random.randint(jax.random.fold_in(key, 2),
                                (sub * ntiles, lanes), 0, lanes)

    @functools.partial(jax.jit, static_argnums=(0,))
    def f_lane(k, X, I):
        def body(i, acc):
            g = _lane_gather_grid(X, (I + i) % lanes, sub, lanes, ntiles)
            return acc * 1e-20 + jnp.sum(g[:8], axis=0)
        return fori(k, body, jnp.zeros((lanes,), jnp.float32))

    try:
        got = np.asarray(jax.jit(
            lambda a, b: _lane_gather_grid(a, b, sub, lanes, ntiles)
        )(Xbig, idxbig))
        want = np.take_along_axis(np.asarray(Xbig), np.asarray(idxbig), axis=1)
        err = np.abs(got - want).max()
        dt = rate(f_lane, 64, Xbig, idxbig)
        tot = sub * ntiles * lanes
        print(f"lane-gather grid (8x{lanes})x{ntiles}: err={err:.1e} "
              f"{dt/tot*1e9:7.4f} ns/elt", flush=True)
    except Exception as e:
        print(f"lane-gather grid: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # 2. sublane take on (128, r) and (1024, r) tiles
    for rows, r in ((128, 16), (1024, 16), (8192, 16), (128, 128)):
        Xt = jax.random.normal(key, (rows, r), jnp.float32)
        idx = jax.random.randint(jax.random.fold_in(key, 3), (512,), 0, rows)
        want = np.asarray(Xt)[np.asarray(idx)]
        try_case(
            f"sublane-take ({rows},{r})<-512",
            lambda Xt=Xt, idx=idx, rows=rows, r=r:
                jax.jit(lambda a, b: _sublane_take_call(a, b, rows, 512, r))(Xt, idx),
            lambda got, want=want: np.abs(got - want).max(),
        )

    # 3. whole-array take
    r = 16
    X = jax.random.normal(key, (N, r), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 4), (T,), 0, N)
    want_rows = np.asarray(idx)

    @functools.partial(jax.jit, static_argnums=(0,))
    def f_full(k, X, I):
        def body(i, acc):
            g = _full_take_call(X, (I + i) % N, r)
            return acc * 1e-20 + jnp.sum(g, axis=0)
        return fori(k, body, jnp.zeros((r,), jnp.float32))

    try:
        got = np.asarray(jax.jit(lambda a, b: _full_take_call(a, b, r))(X, idx))
        want = np.asarray(X)[want_rows]
        err = np.abs(got - want).max()
        dt = rate(f_full, 32, X, idx)
        print(f"full-take pallas (N,{r})<-T: err={err:.1e} "
              f"{dt/T*1e9:7.3f} ns/row", flush=True)
    except Exception as e:
        print(f"full-take pallas: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # 4. XLA HBM row-take dtype effect
    @functools.partial(jax.jit, static_argnums=(0,))
    def f_take_rows(k, X, idx):
        def body(i, acc):
            g = jnp.take(X, (idx + i) % N, axis=0)
            return acc * 1e-20 + jnp.sum(g, axis=0).astype(jnp.float32)
        return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))

    for dt_ in (jnp.float32, jnp.bfloat16):
        Xd = X.astype(dt_)
        dt = rate(f_take_rows, 256, Xd, idx)
        print(f"XLA row take r=16 {np.dtype(dt_).name}: {dt/T*1e9:7.3f} ns/row",
              flush=True)
    for r2 in (32, 64, 128):
        X2 = jax.random.normal(key, (N, r2), jnp.float32)
        dt = rate(f_take_rows, 128, X2, idx)
        print(f"XLA row take r={r2} f32: {dt/T*1e9:7.3f} ns/row", flush=True)


if __name__ == "__main__":
    main()
