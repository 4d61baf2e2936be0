"""Marginal vs fixed cost of the symdemod pieces: scan nwin windows of
timesearch / integrate at bench shapes for nwin in {2, 7, 14} and look at
the slope.  Also: one big batched integrate gather for all windows."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from isee3_decoder_tpu.models.symdemod import initial_firstsample, window_samples
    from isee3_decoder_tpu.ops import symbols as sym_ops
    from isee3_decoder_tpu.ops.symbols import SymConfig

    B = int(os.environ.get("PROF_NCHAN", "128"))
    samprate, symrate = 250_000.0, 1024.0
    sym = SymConfig(samprate=samprate, symrate=symrate)
    L = 4_200_000  # room for 14 windows

    rng = np.random.default_rng(0)
    bb = jnp.asarray(rng.integers(-100, 100, (B, L), dtype=np.int64).astype(np.int16))
    csum = jax.jit(sym_ops.prefix_sum)(bb)
    span = sym_ops.timesearch_csum_span(
        sym.halfclock, sym.nsymbols, sym.symbolclocks, sym.noffsets
    )
    csum_p = jax.jit(lambda c: jnp.pad(c, ((0, 0), (0, span + 64)), mode="edge"))(csum)
    float(csum_p[0, -1])
    first0 = initial_firstsample(sym)
    wlen = window_samples(sym)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        float(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)

    for nwin in (2, 7, 14):
        firsts = jnp.asarray(
            first0 + wlen * np.arange(nwin)[:, None] + np.zeros((1, B)), jnp.int32
        )

        def integ_run(c, firsts=firsts):
            def body(acc, first):
                integ = sym_ops.integrate_from_csum(
                    c, first, sym.halfclock, sym.nsymbols, sym.symbolclocks
                )
                return acc + integ.sum().astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), firsts)
            return acc

        def ts_run(c, firsts=firsts):
            def body(acc, first):
                r = sym_ops.timesearch_from_csum(
                    c, first, sym.halfclock, sym.nsymbols,
                    sym.symbolclocks, sym.noffsets,
                )
                return acc + r.maxenergy.sum().astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), firsts)
            return acc

        bench(f"integrate_scan_x{nwin}", jax.jit(integ_run), csum_p)
        bench(f"timesearch_scan_x{nwin}", jax.jit(ts_run), csum_p)

    # batched: all windows' edges in ONE take_along_axis
    nwin = 7
    firsts_np = first0 + wlen * np.arange(nwin)[:, None] + np.zeros((1, B))
    firsts_b = jnp.asarray(firsts_np, jnp.int32)  # (nwin, B)
    rel = sym_ops.trial_edges(sym.halfclock, sym.nsymbols, sym.symbolclocks)
    flo = np.floor(rel)
    E = (flo + (rel - flo > 0.5)).astype(np.int32)
    Ed = jnp.asarray(E)

    @jax.jit
    def integ_batched(c, firsts_b):
        edges = (
            firsts_b.T[:, :, None] + Ed[None, None, :]
        ).reshape(B, -1)  # (B, nwin*2049)
        g = jnp.take_along_axis(c, edges, axis=-1)
        return g.sum(dtype=jnp.int32).astype(jnp.float32)

    bench("integrate_batched_x7_onegather", integ_batched, csum_p, firsts_b)


if __name__ == "__main__":
    main()
