"""Profile pm_demod_scan's locked-path pieces at bench shapes with raw
int16 ingestion (the production configuration)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from isee3_decoder_tpu.ops.carrier import (
        PMConfig,
        find_carrier_windowed,
        init_carry,
        iq_from_interleaved,
        pm_demod_scan,
        spin_down,
    )

    B = int(os.environ.get("PROF_NCHAN", "128"))
    samprate = 250_000.0
    pm = PMConfig(samprate=samprate, binsize=4.0, search_width=200.0)
    n = pm.fftsize
    T = 32

    raw = jax.jit(
        lambda k: jax.random.randint(
            k, (B, T, 2 * n), -3000, 3000, jnp.int32
        ).astype(jnp.int16)
    )(jax.random.PRNGKey(0))
    freq = jnp.full((B,), 20_000.0, jnp.float32)
    carry_locked = init_carry(B, pm)._replace(
        search_center=freq, cn0=jnp.full((B,), 60.0, jnp.float32)
    )

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        float(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)

    def scan_sum(step):
        def run(x):
            def body(acc, blk):
                return acc + step(blk), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
            return acc
        return jax.jit(run)

    rawT = jnp.swapaxes(raw, 0, 1)  # (T, B, 2n) scan layout
    rawT.block_until_ready()

    bench(
        "ingest_only",
        scan_sum(lambda blk: jnp.abs(iq_from_interleaved(blk)).sum()),
        rawT,
    )
    bench(
        "ingest+windowed_search",
        scan_sum(
            lambda blk: find_carrier_windowed(
                iq_from_interleaved(blk), carry_locked, pm
            )[0].sum()
        ),
        rawT,
    )
    bench(
        "ingest+spin_down",
        scan_sum(
            lambda blk: spin_down(iq_from_interleaved(blk), freq, pm)[2].sum()
        ),
        rawT,
    )
    bench(
        "ingest+search+spin(emit)",
        scan_sum(
            lambda blk: (
                lambda iq: jnp.trunc(
                    spin_down(
                        iq, find_carrier_windowed(iq, carry_locked, pm)[0], pm
                    )[0].imag
                    * np.sqrt(0.5)
                )
                .astype(jnp.int16)
                .sum(dtype=jnp.int32)
                .astype(jnp.float32)
            )(iq_from_interleaved(blk))
        ),
        rawT,
    )

    @jax.jit
    def full_scan(rawT):
        carry, out = pm_demod_scan(init_carry(B, pm), jnp.swapaxes(rawT, 0, 1), pm)
        return out.baseband.sum(dtype=jnp.int32).astype(jnp.float32)

    bench("pm_demod_scan_full", full_scan, rawT)


if __name__ == "__main__":
    main()
