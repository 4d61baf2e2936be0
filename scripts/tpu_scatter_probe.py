"""Micro-benchmark: per-iteration cost of Fano-style state updates in a
lax.while_loop on TPU.

Variants:
  A: 8 separate (B,N) arrays, .at[bidx, idx].set each iteration (current)
  B: one packed (B,N,8) array, single scatter per iteration
  C: one packed (B,8,N) array, scatter on last axis
  D: 8 separate arrays updated via one-hot select (explicit dense)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 200


def main():
    import jax
    import jax.numpy as jnp

    B, N = 128, 1024
    bidx = jnp.arange(B)

    def timeit(name, fn, *args):
        try:
            r = fn(*args)
            float(jax.tree_util.tree_leaves(r)[0].sum())
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(*args)
                float(jax.tree_util.tree_leaves(r)[0].sum())
                times.append(time.perf_counter() - t0)
            per_iter_us = min(times) / ITERS * 1e6
            print(
                json.dumps({"variant": name, "us_per_iter": round(per_iter_us, 1)}),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:150]}), flush=True)

    arrs = tuple(jnp.zeros((B, N), jnp.int32) for _ in range(8))

    @jax.jit
    def variant_a(arrs):
        def body(c):
            i, arrs = c
            idx = (i * 7 + bidx) % N
            new = tuple(
                a.at[bidx, idx].set(a[bidx, idx] + 1) for a in arrs
            )
            return (i + 1, new)

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), arrs))[1]

    packed = jnp.zeros((B, N, 8), jnp.int32)

    @jax.jit
    def variant_b(p):
        def body(c):
            i, p = c
            idx = (i * 7 + bidx) % N
            row = p[bidx, idx] + 1  # (B, 8)
            return (i + 1, p.at[bidx, idx].set(row))

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), p))[1]

    packed2 = jnp.zeros((B, 8, N), jnp.int32)

    @jax.jit
    def variant_c(p):
        def body(c):
            i, p = c
            idx = (i * 7 + bidx) % N
            row = p[bidx, :, idx] + 1  # (B, 8)
            return (i + 1, p.at[bidx, :, idx].set(row))

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), p))[1]

    @jax.jit
    def variant_d(arrs):
        def body(c):
            i, arrs = c
            idx = (i * 7 + bidx) % N
            oh = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1) == idx[:, None]
            new = tuple(jnp.where(oh, a + 1, a) for a in arrs)
            return (i + 1, new)

        return jax.lax.while_loop(lambda c: c[0] < ITERS, body, (jnp.int32(0), arrs))[1]

    timeit("A_8scatters", variant_a, arrs)
    timeit("B_packed_minor", variant_b, packed)
    timeit("C_packed_mid", variant_c, packed2)
    timeit("D_onehot_dense", variant_d, arrs)


if __name__ == "__main__":
    main()
