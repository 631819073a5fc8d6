"""Probe 4: XLA gather variants — what moves the ~2.5 ns/index needle?"""
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


@functools.partial(jax.jit, static_argnums=(0,))
def f_take(k, X, idx):
    def body(i, acc):
        g = jnp.take(X, (idx + i) % N, axis=0)
        return acc * 1e-20 + jnp.sum(g, axis=0)
    return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_take_inb(k, X, idx):
    def body(i, acc):
        g = jnp.take(X, (idx + i) % N, axis=0, mode="clip")
        return acc * 1e-20 + jnp.sum(g, axis=0)
    return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_take_ax1(k, Xt, idx):
    def body(i, acc):
        g = jnp.take(Xt, (idx + i) % N, axis=1)
        return acc * 1e-20 + jnp.sum(g, axis=1)
    return fori(k, body, jnp.zeros((Xt.shape[0],), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_take_sorted(k, X, idx):
    def body(i, acc):
        g = jnp.take(X, jnp.minimum(idx + i, N - 1), axis=0)
        return acc * 1e-20 + jnp.sum(g, axis=0)
    return fori(k, body, jnp.zeros((X.shape[1],), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_ell_einsum(k, X, cols, vals):
    n, W = cols.shape

    def body(i, acc):
        Xg = jnp.take(X, cols.reshape(-1), axis=0).reshape(n, W, -1)
        out = jnp.einsum("nw,nwr->nr", vals + acc[0, 0] * 1e-20, Xg)
        return acc * 1e-20 + out
    return fori(k, body, jnp.zeros((n, X.shape[1]), jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (T,), 0, N)
    for r in (8, 16, 48, 64, 96):
        X = jax.random.normal(key, (N, r), jnp.float32)
        dt = rate(f_take, 128, X, idx)
        print(f"take r={r:3d}              : {dt/T*1e9:7.3f} ns/idx", flush=True)

    r = 16
    X = jax.random.normal(key, (N, r), jnp.float32)
    dt = rate(f_take_inb, 128, X, idx)
    print(f"take mode=clip r=16      : {dt/T*1e9:7.3f} ns/idx", flush=True)

    Xt = jnp.asarray(np.asarray(X).T.copy())
    dt = rate(f_take_ax1, 64, Xt, idx)
    print(f"take axis=1 (16,N)      : {dt/T*1e9:7.3f} ns/idx", flush=True)

    sidx = jnp.sort(idx)
    dt = rate(f_take_sorted, 128, X, sidx)
    print(f"take sorted idx r=16    : {dt/T*1e9:7.3f} ns/idx", flush=True)

    # realistic ELL SpMM shapes: n=100k, W=32
    n, W = N, 32
    cols = jax.random.randint(key, (n, W), 0, N)
    vals = jax.random.normal(key, (n, W), jnp.float32)
    dt = rate(f_ell_einsum, 32, X, cols, vals)
    nsidx = dt / (n * W) * 1e9
    gf = 2 * n * W * r / dt / 1e9
    print(f"ELL einsum n=100k W=32  : {nsidx:7.3f} ns/idx  {gf:6.1f} GFLOP/s",
          flush=True)

    # ELL with per-row-sorted, locality-clustered columns (band pattern)
    colsb = (np.random.default_rng(0).integers(-2000, 2000, (n, W))
             + np.arange(n)[:, None]) % n
    colsb.sort(axis=1)
    colsb = jnp.asarray(colsb, jnp.int32)
    dt = rate(f_ell_einsum, 32, X, colsb, vals)
    print(f"ELL einsum banded       : {dt/(n*W)*1e9:7.3f} ns/idx", flush=True)


if __name__ == "__main__":
    main()
