"""Probe 5: (a) Pallas DMA-issued row gather vs XLA take's 2.5 ns/idx;
(b) restructured XLA ELL SpMM forms vs the 3.6 ns/idx einsum."""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100_000
T = 1 << 18


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


# (a) Pallas DMA gather: X stays in HBM (ANY), idx prefetched to SMEM,
# kernel issues per-row async copies with NSLOT outstanding DMAs.
def _dma_gather(X, idx, r, nslot=8, rows_per_dma=1):
    E = idx.shape[0] // rows_per_dma

    def kernel(i_ref, x_hbm, o_ref, scratch, sems):
        def issue(e, slot):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i_ref[e] * rows_per_dma, rows_per_dma), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for s in range(nslot):
            issue(s, s).start()

        def body(e, _):
            slot = jax.lax.rem(e, nslot)
            issue(e, slot).wait()
            o_ref[pl.ds(e * rows_per_dma, rows_per_dma), :] = scratch[slot]

            @pl.when(e + nslot < E)
            def _():
                issue(e + nslot, slot).start()
            return 0

        jax.lax.fori_loop(0, E, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslot, rows_per_dma, r), jnp.float32),
            pltpu.SemaphoreType.DMA((nslot,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((E * rows_per_dma, r), jnp.float32),
        grid_spec=grid_spec,
    )(idx, X)


# (b) striped ELL: W separate column takes, fused multiply-add
@functools.partial(jax.jit, static_argnums=(0,))
def f_ell_striped(k, X, cols, vals):
    n, W = cols.shape

    def body(i, acc):
        out = jnp.zeros((n, X.shape[1]), jnp.float32)
        for w in range(W):
            out = out + vals[:, w:w + 1] * jnp.take(X, cols[:, w], axis=0)
        return acc * 1e-20 + out
    return fori(k, body, jnp.zeros((n, X.shape[1]), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_ell_einsum(k, X, cols, vals):
    n, W = cols.shape

    def body(i, acc):
        Xg = jnp.take(X, cols.reshape(-1), axis=0).reshape(n, W, -1)
        out = jnp.einsum("nw,nwr->nr", vals + acc[0, 0] * 1e-20, Xg)
        return acc * 1e-20 + out
    return fori(k, body, jnp.zeros((n, X.shape[1]), jnp.float32))


@functools.partial(jax.jit, static_argnums=(0,))
def f_ell_flat(k, X, cols, vals):
    """take at flat (n*W,), multiply flat, reshape+sum."""
    n, W = cols.shape
    r = X.shape[1]

    def body(i, acc):
        Xg = jnp.take(X, cols.reshape(-1), axis=0)
        Xg = Xg * vals.reshape(-1, 1)
        out = jnp.sum(Xg.reshape(n, W, r), axis=1)
        return acc * 1e-20 + out
    return fori(k, body, jnp.zeros((n, r), jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    r = 16
    X = jax.random.normal(key, (N, r), jnp.float32)
    idx = jax.random.randint(key, (T,), 0, N)

    # correctness + rate of DMA gather
    for nslot, rpd in ((8, 1), (16, 1), (4, 1), (8, 8)):
        try:
            got = np.asarray(jax.jit(
                lambda X, i: _dma_gather(X, i, r, nslot, rpd))(X, idx))
            if rpd == 1:
                want = np.asarray(X)[np.asarray(idx)]
            else:
                base = np.asarray(idx)[:T // rpd] * rpd
                want = np.asarray(X)[
                    (base[:, None] + np.arange(rpd)[None]).reshape(-1) % N]
            err = np.abs(got - want).max()

            @functools.partial(jax.jit, static_argnums=(0,))
            def f_dma(k, X, idx):
                def body(i, acc):
                    g = _dma_gather(X, (idx + i) % (N - 8), r, nslot, rpd)
                    return acc * 1e-20 + jnp.sum(g[:8], axis=0)
                return fori(k, body, jnp.zeros((r,), jnp.float32))

            dt = rate(f_dma, 16, X, idx)
            nidx = T // rpd
            print(f"pallas DMA gather nslot={nslot} rpd={rpd}: "
                  f"{dt/nidx*1e9:7.3f} ns/DMA err={err:.1e}", flush=True)
        except Exception as e:
            print(f"pallas DMA gather nslot={nslot} rpd={rpd}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    n, W = N, 32
    cols = jax.random.randint(key, (n, W), 0, N)
    vals = jax.random.normal(key, (n, W), jnp.float32)
    for name, f, K in (("einsum ", f_ell_einsum, 32),
                       ("striped", f_ell_striped, 32),
                       ("flat   ", f_ell_flat, 32)):
        dt = rate(f, K, X, cols, vals)
        print(f"ELL {name} n=100k W=32: {dt/(n*W)*1e9:7.3f} ns/idx "
              f"({2*n*W*r/dt/1e9:6.1f} GFLOP/s)", flush=True)


if __name__ == "__main__":
    main()
