"""Micro-profile of the demod path's component ops at bench shapes.

Each op is jitted standalone (scanned over time blocks exactly like
production) with a scalar-readback checksum — the only reliable sync
through the tunneled runtime — so we can see where pm_demod_scan /
symdemod_scan wall time actually goes.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *args, reps=3):
    try:
        out = fn(*args)  # compile
        float(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)
        return best
    except Exception as e:  # noqa: BLE001 — report and keep profiling
        print(json.dumps({"op": name, "error": str(e)[:120]}), flush=True)
        return None


def main():
    import jax
    import jax.numpy as jnp

    from isee3_decoder_tpu.models.symdemod import (
        initial_firstsample,
        window_samples,
    )
    from isee3_decoder_tpu.ops import symbols as sym_ops
    from isee3_decoder_tpu.ops.carrier import (
        PMConfig,
        find_carrier,
        init_carry,
        spin_down,
    )
    from isee3_decoder_tpu.ops.symbols import SymConfig

    B = int(os.environ.get("PROF_NCHAN", "128"))
    samprate, symrate = 250_000.0, 1024.0
    nframes = 4
    seconds = (nframes * 2048 + 400) / symrate
    L = int(seconds * samprate)
    pm = PMConfig(samprate=samprate, binsize=4.0, search_width=200.0)
    sym = SymConfig(samprate=samprate, symrate=symrate)
    n = pm.fftsize
    nblocks = L // n
    print(json.dumps({"B": B, "L": L, "fftsize": n, "nblocks": nblocks}))

    # (nblocks, B, n) — the scan layout production uses
    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (nblocks, B, n), jnp.float32)
            + 1j * jax.random.normal(k2, (nblocks, B, n), jnp.float32)
        ).astype(jnp.complex64)

    iq = gen(jax.random.PRNGKey(0))
    float(jnp.real(iq[0, 0, 0]))

    def scan_sum(step):
        def run(x):
            def body(acc, blk):
                return acc + step(blk), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
            return acc
        return jax.jit(run)

    # --- pmdemod pieces ---
    bench("fft_scan", scan_sum(lambda blk: jnp.abs(jnp.fft.fft(blk, axis=-1)).sum()), iq)

    carry = init_carry(B, pm)
    bench(
        "fft+find_carrier_scan",
        scan_sum(
            lambda blk: find_carrier(jnp.fft.fft(blk, axis=-1), carry, pm)[0].sum()
        ),
        iq,
    )

    freq = jnp.full((B,), 20_000.0, jnp.float32)
    bench(
        "spin_down_scan",
        scan_sum(lambda blk: spin_down(blk, freq, pm)[2].sum()),
        iq,
    )

    def lo_step(blk):
        i = jnp.arange(n, dtype=jnp.int32)
        ihi = (i // 256).astype(jnp.float32)
        ilo = (i % 256).astype(jnp.float32)
        c = (freq / samprate).astype(jnp.float32)
        c256 = jnp.mod(c * 256.0, 1.0)
        cyc = c256[:, None] * ihi[None, :] + c[:, None] * ilo[None, :]
        lo = jnp.exp((-2j * np.pi) * cyc)
        return jnp.abs((blk * lo).sum())

    bench("lo_exp_mix_scan", scan_sum(lo_step), iq)

    # --- symdemod pieces ---
    bb = jax.jit(
        lambda x: jnp.trunc(
            jnp.swapaxes(x, 0, 1).reshape(B, -1).real * 100
        ).astype(jnp.int16)
    )(iq)
    bb.block_until_ready()

    bench("prefix_sum", jax.jit(lambda s: sym_ops.prefix_sum(s)[:, -1].sum().astype(jnp.float32)), bb)

    csum = jax.jit(sym_ops.prefix_sum)(bb)
    span = sym_ops.timesearch_csum_span(
        sym.halfclock, sym.nsymbols, sym.symbolclocks, sym.noffsets
    )
    csum_p = jax.jit(lambda c: jnp.pad(c, ((0, 0), (0, span + 64)), mode="edge"))(csum)
    csum_p.block_until_ready()
    first0 = initial_firstsample(sym)
    wlen = window_samples(sym)
    nwin = max((nblocks * n - first0) // wlen - 1, 0)
    firsts = jnp.asarray(
        first0 + wlen * np.arange(nwin)[:, None] + np.zeros((1, B)), jnp.int32
    )

    def ts_run(c):
        def body(acc, first):
            r = sym_ops.timesearch_from_csum(
                c, first, sym.halfclock, sym.nsymbols,
                sym.symbolclocks, sym.noffsets,
            )
            return acc + r.maxenergy.sum().astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), firsts)
        return acc

    bench("timesearch_scan_x%d" % nwin, jax.jit(ts_run), csum_p)

    def integ_run(c):
        def body(acc, first):
            integ = sym_ops.integrate_from_csum(
                c, first, sym.halfclock, sym.nsymbols, sym.symbolclocks
            )
            return acc + integ.sum().astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), firsts)
        return acc

    bench("integrate_scan_x%d" % nwin, jax.jit(integ_run), csum_p)


if __name__ == "__main__":
    main()
