"""Stage breakdown of demod_to_symbols at bench shapes on TPU: pm scan,
prefix sum, timesearch, integrate, full chain — with a locking tone so
the pm scan takes the fused locked path (the production configuration).
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

    from isee3_decoder_tpu.models import symdemod as symdemod_model
    from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
    from isee3_decoder_tpu.ops import prefix_pallas
    from isee3_decoder_tpu.ops import symbols as sym_ops
    from isee3_decoder_tpu.ops.carrier import PMConfig, init_carry, pm_demod_scan

    B = int(os.environ.get("PROF_NCHAN", "128"))
    T = 32
    cfg = PipelineConfig(
        pm=PMConfig(samprate=250_000.0, binsize=4.0, search_width=200.0)
    )
    n = cfg.pm.fftsize
    fs = cfg.pm.samprate

    @jax.jit
    def gen(key):
        t = jnp.arange(T * n, dtype=jnp.float32) / np.float32(fs)
        freqs = 20_000.0 + 61.0 * jnp.arange(B, dtype=jnp.float32)
        cyc = jnp.mod(freqs[:, None] * t[None, :], 1.0)
        ns = jax.random.normal(key, (B, T * n, 2)) * 250.0
        i = 9000.0 * jnp.cos(2 * np.pi * cyc) + ns[..., 0]
        q = 9000.0 * jnp.sin(2 * np.pi * cyc) + ns[..., 1]
        raw = jnp.stack([i, q], -1).reshape(B, T, 2 * n)
        return jnp.trunc(jnp.clip(raw, -32767, 32767)).astype(jnp.int16)

    raw_blocks = gen(jax.random.PRNGKey(0))
    float(raw_blocks.sum(dtype=jnp.int32))
    raw_flat = raw_blocks.reshape(B, -1)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        float(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)

    wlen = symdemod_model.window_samples(cfg.sym)
    first0 = symdemod_model.initial_firstsample(cfg.sym)
    nwindows = max((T * n - first0) // wlen - 1, 0)

    @jax.jit
    def pm_only(rb):
        _, out = pm_demod_scan(init_carry(B, cfg.pm), rb, cfg.pm)
        return out.baseband.sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def pm_csum(rb):
        _, out = pm_demod_scan(init_carry(B, cfg.pm), rb, cfg.pm)
        csum = prefix_pallas.prefix_sum_blocks(out.baseband)
        return csum[:, ::997].sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def pm_csum_search(rb):
        _, out = pm_demod_scan(init_carry(B, cfg.pm), rb, cfg.pm)
        csum = prefix_pallas.prefix_sum_blocks(out.baseband)

        def wstep(first, _):
            ts = sym_ops.timesearch_from_csum(
                csum, first, cfg.sym.halfclock, cfg.sym.nsymbols,
                cfg.sym.symbolclocks, cfg.sym.noffsets,
            )
            first = first + ts.symphase
            first = jnp.trunc(
                first.astype(jnp.float32)
                + np.float64(cfg.sym.nsymbols * cfg.sym.symbolsamples).item()
            ).astype(jnp.int32)
            return first, ts.maxenergy

        first = jnp.full((B,), first0, jnp.int32)
        _, en = jax.lax.scan(wstep, first, None, length=nwindows)
        return en.sum()

    @jax.jit
    def full(rb):
        soft, _, _, _ = demod_to_symbols(rb.reshape(B, -1), cfg)
        return soft.sum(dtype=jnp.int32).astype(jnp.float32)

    bench("pm_only", pm_only, raw_blocks)
    bench("pm+csum", pm_csum, raw_blocks)
    bench("pm+csum+timesearch", pm_csum_search, raw_blocks)
    bench("demod_to_symbols", full, raw_blocks)
    print(json.dumps({"nwindows": int(nwindows)}), flush=True)


if __name__ == "__main__":
    main()
