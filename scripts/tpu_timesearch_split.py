"""Split the tracked timesearch window cost: base dynamic_slice copy vs
grouped esum compute vs integrate, at bench shapes (128 ch).
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

    from isee3_decoder_tpu.ops import symbols as sym_ops
    from isee3_decoder_tpu.ops.symbols import SymConfig

    B = int(os.environ.get("PROF_NCHAN", "128"))
    cfg = SymConfig(samprate=250_000.0, symrate=1024.0)
    hc, ns, sc, no = (
        cfg.halfclock, cfg.nsymbols, cfg.symbolclocks, cfg.noffsets
    )
    rel = sym_ops.search_edges(hc, ns, sc)
    groups = sym_ops._symbol_group_plan(rel, no, sc)
    W = no + sym_ops.TRACK_DELTA
    span_w = sym_ops._grouped_span(groups, rel, ns, sc, W)
    L = span_w + 4096
    print(json.dumps({"span_w": span_w, "ngroups": len(groups), "W": W}))

    rng = np.random.default_rng(0)
    csum = jnp.asarray(
        np.cumsum(rng.integers(-100, 100, (B, L)), axis=1, dtype=np.int32)
    )
    first = jnp.full((B,), 300, jnp.int32)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.asarray(fn(*args)).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)

    R = int(os.environ.get("PROF_REPS", "24"))

    def scanner(step):
        """Run `step` R times inside ONE program (distinct dynamic
        starts so nothing folds), so the per-step cost resolves under
        the ~26 ms dispatch floor."""

        @jax.jit
        def run(c, f):
            def body(carry, i):
                acc = step(c, f + 2 * i)
                return carry + acc, 0

            tot, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(R, dtype=jnp.int32)
            )
            return tot

        return run

    def slice_step(c, f):
        s0 = jnp.clip(jnp.min(f) - no // 2, 0, c.shape[1] - span_w)
        base = jax.lax.dynamic_slice(
            c, (jnp.zeros((), jnp.int32), s0), (B, span_w)
        )
        return base[:, ::1013].sum(dtype=jnp.int32).astype(jnp.float32)

    def grouped_step(c, f):
        r = sym_ops._timesearch_grouped(c, f, rel, ns, sc, no, groups)
        return r.sum().astype(jnp.float32)

    def integrate_step(c, f):
        i = sym_ops.integrate_from_csum(c, f, hc, ns, sc)
        return i.sum(dtype=jnp.int32).astype(jnp.float32)

    rel_t = sym_ops.trial_edges(hc, ns, sc)
    flo = np.floor(rel_t)
    frac = rel_t - flo
    flo_d = jnp.asarray(flo.astype(np.int32))
    up_d = jnp.asarray((frac > 0.5).astype(np.int32))
    tie_d = jnp.asarray((frac == 0.5).astype(np.int32))

    def integrate_flat_step(c, f):
        # same edges as integrate_from_csum but gathered through a FLAT
        # 1-D take on the raveled csum — probes the alternative XLA
        # gather lowering
        base = f[:, None] + flo_d[None, :]
        abs_edges = base + up_d[None, :] + tie_d[None, :] * (base & 1)
        flat = abs_edges + (jnp.arange(B, dtype=jnp.int32) * c.shape[1])[:, None]
        g = jnp.take(c.reshape(-1), flat.reshape(-1), axis=0).reshape(B, -1)
        seg = (g[:, 1:] - g[:, :-1]).reshape(B, ns, sc, 2)
        i = (seg[..., 1] - seg[..., 0]).sum(axis=-1, dtype=c.dtype)
        return i.sum(dtype=jnp.int32).astype(jnp.float32)

    span_i = int(rel_t[-1]) + 8

    def integrate_narrow_step(c, f):
        # slice a shared narrow base first (cheap), gather edges from it
        s0 = jnp.min(f)
        base_arr = jax.lax.dynamic_slice(
            c, (jnp.zeros((), jnp.int32), s0), (B, span_i + 512)
        )
        fr = f - s0
        base = fr[:, None] + flo_d[None, :]
        # parity of the ABSOLUTE edge: (s0 + base) & 1 — keep via f parity
        absbase = f[:, None] + flo_d[None, :]
        abs_edges = base + up_d[None, :] + tie_d[None, :] * (absbase & 1)
        g = jnp.take_along_axis(base_arr, abs_edges, axis=-1)
        seg = (g[:, 1:] - g[:, :-1]).reshape(B, ns, sc, 2)
        i = (seg[..., 1] - seg[..., 0]).sum(axis=-1, dtype=c.dtype)
        return i.sum(dtype=jnp.int32).astype(jnp.float32)

    from isee3_decoder_tpu.models.symdemod import symdemod_scan_csum

    def window_full_step(c, f):
        # one full symdemod window: timesearch + integrate + finish
        ts = sym_ops.timesearch_from_csum(c, f, hc, ns, sc, no)
        fs = f + ts.symphase
        integ = sym_ops.integrate_from_csum(c, fs, hc, ns, sc)
        gain = 100.0 / jnp.sqrt(ts.maxenergy)
        soft, _ = sym_ops.finish_demod(integ, gain)
        return soft.sum(dtype=jnp.int32).astype(jnp.float32)

    floor = 0.026
    for name, step in [
        ("dynamic_slice_base", slice_step),
        ("timesearch_grouped_full", grouped_step),
        ("integrate_from_csum", integrate_step),
        ("integrate_flat_take", integrate_flat_step),
        ("integrate_narrow_gather", integrate_narrow_step),
        ("window_full", window_full_step),
    ]:
        fn = scanner(step)
        fn(csum, first)
        float(fn(csum, first))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(csum, first))
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "op": name,
                    "wall_s": round(best, 4),
                    "per_step_ms": round((best - floor) / R * 1e3, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
