"""Micro-benchmark: timesearch gather formulations on TPU.

g[b, o, j] = csum[b, first_b + o + rel_j],  o in [0,245), j in [0,2049)

A: elementwise take_along_axis (current implementation)
B: per-channel base dynamic_slice + vmapped dynamic_slice over j (slices)
C: like B but over static rel starts (base factored out)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    B = 32
    L = 2_100_000
    nsym = 1024
    noff = 245
    hc = 250000.0 / 1024.0 / 2
    rel = np.rint(np.cumsum(np.full(2 * nsym, hc))).astype(np.int32)
    rel = np.concatenate([[0], rel])  # (2049,)
    nseg = rel.size

    rng = np.random.default_rng(0)
    csum = jnp.asarray(
        rng.integers(-(2**30), 2**30, (B, L + 1), dtype=np.int64).astype(np.int32)
    )
    first = jnp.asarray(rng.integers(500, 600, B).astype(np.int32))
    relj = jnp.asarray(rel)

    def reduce_seg(g):
        # g: (B, noff, nseg) -> energy-ish scalar for sync
        seg = g[..., 1:] - g[..., :-1]
        integ = seg.reshape(B, noff, nsym, 2)
        integ = integ[..., 1] - integ[..., 0]
        e = (integ.astype(jnp.float32) ** 2).mean(axis=-1)
        return e.sum()

    @jax.jit
    def variant_a(csum, first):
        offsets = jnp.arange(noff, dtype=jnp.int32)
        abs_edges = first[:, None, None] + offsets[None, :, None] + relj[None, None, :]
        g = jnp.take_along_axis(csum, abs_edges.reshape(B, -1), axis=-1).reshape(
            B, noff, nseg
        )
        return reduce_seg(g)

    @jax.jit
    def variant_b(csum, first):
        # slice gather: for each (b, j) a contiguous noff-slice
        def per_chan(v, f):
            def per_edge(s):
                return jax.lax.dynamic_slice(v, (f + s,), (noff,))

            return jax.vmap(per_edge)(relj)  # (nseg, noff)

        g = jax.vmap(per_chan)(csum, first)  # (B, nseg, noff)
        return reduce_seg(jnp.swapaxes(g, 1, 2))

    @jax.jit
    def variant_c(csum, first):
        # factor out the dynamic base: one dynamic slice per channel,
        # then static-start slices stacked
        span = int(rel[-1]) + noff + 1
        def per_chan(v, f):
            base = jax.lax.dynamic_slice(v, (f,), (span,))
            rows = [jax.lax.slice(base, (int(s),), (int(s) + noff,)) for s in rel]
            return jnp.stack(rows)  # (nseg, noff)

        g = jax.vmap(per_chan)(csum, first)
        return reduce_seg(jnp.swapaxes(g, 1, 2))

    for name, fn in (("A_elemwise", variant_a), ("B_slicegather", variant_b), ("C_staticslices", variant_c)):
        try:
            t0 = time.perf_counter()
            r = fn(csum, first)
            float(r)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(csum, first))
                times.append(time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "compile_s": round(compile_s, 1),
                        "best_ms": round(min(times) * 1e3, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
