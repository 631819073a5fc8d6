"""Probe 2: micro-measurements that drive the Pallas SpMM design (v5e).

Axon-platform quirks this harness works around:
  * block_until_ready does NOT force the first compile+execution — only a
    host fetch does, so every measurement fetches a scalar;
  * RTT jitter is tens of ms, so rates come from t(K) - t(K/2) with K
    large enough that compute dominates.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100_000
T = 1 << 19


def fetch(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])


def rate(f, K, *args):
    """Seconds per repeat via (t(K) - t(K/2)) / (K/2), min over 3 trials."""
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


# ---------------------------------------------------------------- matmul
@functools.partial(jax.jit, static_argnums=(0,))
def f_matmul(k, A, B):
    def body(i, acc):
        C = (A + acc[0, 0] * 1e-30) @ B
        return C * 1e-9
    return fori(k, body, A)[:1, :1]


@functools.partial(jax.jit, static_argnums=(0, 3))
def f_matmul_p(k, A, B, prec):
    def body(i, acc):
        C = jnp.dot(A + acc[0, 0] * 1e-30, B, precision=prec,
                    preferred_element_type=jnp.float32)
        return C * 1e-9
    return fori(k, body, jnp.zeros(A.shape, jnp.float32))[:1, :1]


# ------------------------------------------------------------------ copy
@functools.partial(jax.jit, static_argnums=(0,))
def f_copy(k, x):
    def body(i, acc):
        y = x + acc[0]
        return acc.at[0].add(y[-1, -1] * 1e-20 + y[0, 0] * 1e-20)
    return fori(k, body, jnp.zeros((1,), jnp.float32))


# ------------------------------------------------------------- xla takes
@functools.partial(jax.jit, static_argnums=(0,))
def f_take_rows(k, X, idx):
    def body(i, acc):
        g = jnp.take(X, (idx + i) % N, axis=0)
        return acc * 1e-20 + jnp.sum(g, axis=0)
    return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_take_1d(k, v, idx):
    def body(i, acc):
        g = jnp.take(v, (idx + i) % N)
        return acc * 1e-20 + jnp.sum(g)
    return fori(k, body, jnp.zeros((), jnp.float32))[None]


@functools.partial(jax.jit, static_argnums=(0,))
def f_segsum(k, G, seg):
    def body(i, acc):
        out = jax.ops.segment_sum(G + acc[0, 0] * 1e-20, seg, num_segments=N)
        return acc * 1e-20 + out[:128]
    return fori(k, body, jnp.zeros((128, G.shape[1]), jnp.float32))


# ----------------------------------------------------- pallas candidates
from jax.experimental import pallas as pl          # noqa: E402
from jax.experimental.pallas import tpu as pltpu   # noqa: E402

BUCKET = 512


def _onehot_call(X, wins, offs2d, r, span, bucket):
    """out[t] = onehot(offs2d[t]) @ X[wins[t]*span : +span].

    X stays fully resident in VMEM; wins prefetched to SMEM; per-bucket
    offsets blocked from a (ntiles, bucket) VMEM array.
    """
    ntiles = offs2d.shape[0]

    def kernel(w_ref, off_ref, x_ref, o_ref):
        t = pl.program_id(0)
        off = off_ref[pl.ds(t, 1), :].reshape(bucket, 1)
        sel = (off == jax.lax.broadcasted_iota(jnp.int32, (bucket, span), 1))
        xwin = x_ref[pl.ds(w_ref[t] * span, span), :]
        o_ref[:] = jnp.dot(sel.astype(jnp.float32), xwin,
                           preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # offs, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),   # X, whole array
        ],
        out_specs=pl.BlockSpec((bucket, r), lambda i, w: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ntiles * bucket, r), jnp.float32),
        grid_spec=grid_spec,
    )(wins, offs2d, X)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def f_pallas_onehot(k, X, wins, offs2d, r, span, bucket):
    def body(i, acc):
        g = _onehot_call(X, (wins + i) % (N // span), offs2d, r, span, bucket)
        return acc * 1e-20 + jnp.sum(g, axis=0)
    return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


def check_onehot(X, r, span, bucket):
    nt = T // bucket
    key = jax.random.PRNGKey(3)
    wins = jax.random.randint(key, (nt,), 0, N // span)
    offs = jax.random.randint(jax.random.fold_in(key, 1), (nt, bucket), 0, span)
    got = np.asarray(jax.jit(
        lambda X, w, o: _onehot_call(X, w, o, r, span, bucket))(X, wins, offs))
    rows = (np.repeat(np.asarray(wins), bucket) * span
            + np.asarray(offs).reshape(-1))
    want = np.asarray(X)[rows]
    return np.abs(got - want).max()


def main():
    r = 16
    A = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    dt = rate(f_matmul, 256, A, A)
    print(f"matmul 4096^3 f32 default : {2*4096**3/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    dt = rate(f_matmul_p, 64, A, A, jax.lax.Precision.HIGHEST)
    print(f"matmul 4096^3 f32 HIGHEST : {2*4096**3/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    Ab = A.astype(jnp.bfloat16)
    dt = rate(f_matmul_p, 256, Ab, Ab, jax.lax.Precision.DEFAULT)
    print(f"matmul 4096^3 bf16        : {2*4096**3/dt/1e12:6.1f} TFLOP/s",
          flush=True)

    big = jax.random.normal(jax.random.PRNGKey(1), (8192, 8192), jnp.float32)
    dt = rate(f_copy, 512, big)
    print(f"r+w 512MB                 : {2*big.size*4/dt/1e9:6.1f} GB/s",
          flush=True)

    X = jax.random.normal(jax.random.PRNGKey(2), (N, r), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(4), (T,), 0, N)
    dt = rate(f_take_rows, 256, X, idx)
    print(f"XLA row take r=16         : {dt/T*1e9:7.3f} ns/row", flush=True)

    v = jax.random.normal(jax.random.PRNGKey(5), (N,), jnp.float32)
    dt = rate(f_take_1d, 256, v, idx)
    print(f"XLA 1-D take              : {dt/T*1e9:7.3f} ns/idx", flush=True)

    G = jax.random.normal(jax.random.PRNGKey(6), (T, r), jnp.float32)
    seg = jnp.sort(idx)
    dt = rate(f_segsum, 128, G, seg)
    print(f"segment_sum r=16          : {dt/T*1e9:7.3f} ns/row", flush=True)

    for span, bucket in ((128, 512), (256, 512), (512, 512), (1024, 512),
                         (128, 128), (128, 256)):
        try:
            err = check_onehot(X, r, span, bucket)
            nt = T // bucket
            wins = jax.random.randint(jax.random.PRNGKey(7), (nt,), 0,
                                      N // span)
            offs = jax.random.randint(jax.random.PRNGKey(8), (nt, bucket), 0,
                                      span)
            dt = rate(f_pallas_onehot, 32, X, wins, offs, r, span, bucket)
            print(f"pallas onehot span={span:4d} bucket={bucket:3d}: "
                  f"{dt/T*1e9:7.3f} ns/row err={err:.1e}", flush=True)
        except Exception as e:
            print(f"pallas onehot span={span} bucket={bucket}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
