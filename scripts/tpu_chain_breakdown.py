"""Stage breakdown of the ACTUAL bench path at bench shapes on TPU.

Unlike tpu_demod_breakdown.py (tone + random symphase walk = dispersed
timesearch regime), this uses the bench's own synthesized telemetry
signal, so the timesearch runs in the tracked regime and the pm scan
takes pm_demod_scan_csum — exactly what BENCH_r*.json measures.
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

    from isee3_decoder_tpu.models.decode import DecodeConfig, decode_block_device
    from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
    from isee3_decoder_tpu.models.symdemod import (
        initial_firstsample,
        symdemod_scan_csum,
        window_samples,
    )
    from isee3_decoder_tpu.ops.carrier import PMConfig, init_carry, pm_demod_scan_csum
    from isee3_decoder_tpu.ops.symbols import SymConfig
    from isee3_decoder_tpu.config import FRAMESYMBOLS
    from isee3_decoder_tpu.utils import testsignal
    from isee3_decoder_tpu.utils.devicesignal import synthesize_iq_device

    samprate, symrate = 250_000.0, 1024.0
    nchan = int(os.environ.get("PROF_NCHAN", "128"))
    nframes = int(os.environ.get("PROF_NFRAMES", "4"))
    noise = float(os.environ.get("PROF_NOISE", "2500"))
    seconds = (nframes * 2048 + 400) / symrate
    nsamples = int(seconds * samprate)

    rng = np.random.default_rng(0)
    frames = testsignal.random_frames(rng, nframes)
    frames_dev = jnp.asarray(np.broadcast_to(frames, (nchan, *frames.shape)))
    carriers = jnp.asarray(20_000.0 + 137.0 * np.arange(nchan), jnp.float32)

    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=4.0, search_width=200.0),
        sym=SymConfig(samprate=samprate, symrate=symrate),
        decode=DecodeConfig(viterbi_backend="inplace"),
    )

    @jax.jit
    def to_raw(iq):
        ri = jnp.stack([iq.real, iq.imag], axis=-1).reshape(iq.shape[0], -1)
        return jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)

    iq = to_raw(
        synthesize_iq_device(
            frames_dev, carriers, jax.random.PRNGKey(0), nsamples,
            samprate=samprate, symrate=symrate, noise_std=noise,
        )
    )
    float(iq[0, 0])

    B = iq.shape[0]
    n = cfg.pm.fftsize
    nblocks = (iq.shape[1] // 2) // n
    blocks = iq[:, : nblocks * 2 * n].reshape(B, nblocks, 2 * n)
    wlen = window_samples(cfg.sym)
    first0 = initial_firstsample(cfg.sym)
    nwindows = max((nblocks * n - first0) // wlen - 1, 0)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        float(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)
        return best

    @jax.jit
    def pm_csum_only(rb):
        _, csum, stats, tots = pm_demod_scan_csum(init_carry(B, cfg.pm), rb, cfg.pm)
        return csum[:, ::997].sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def pm_sym(rb):
        _, csum, stats, tots = pm_demod_scan_csum(init_carry(B, cfg.pm), rb, cfg.pm)
        _, sym_out = symdemod_scan_csum(csum, cfg.sym, nwindows)
        return sym_out.soft.sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def demod_full(raw):
        soft, bb, freq, cn0 = demod_to_symbols(raw, cfg)
        return soft.sum(dtype=jnp.int32).astype(jnp.float32)

    # frames that actually fit the demodulated stream (bench.py logic) —
    # passing more gathers garbage windows and spins the Fano tier
    from isee3_decoder_tpu.config import SYNCBITS
    from isee3_decoder_tpu.ops.syncword import find_sync

    soft_probe, _, _, _ = demod_to_symbols(iq, cfg)
    ss_p, _ = find_sync(soft_probe[:, : FRAMESYMBOLS + SYNCBITS], FRAMESYMBOLS)
    S = soft_probe.shape[1]
    f_avail = int(
        (S - int(jnp.max(ss_p)) - SYNCBITS) // FRAMESYMBOLS
    )

    @jax.jit
    def chain(raw):
        from isee3_decoder_tpu.models.pipeline import receive_block_device
        buf = receive_block_device(raw, f_avail, FRAMESYMBOLS, cfg)
        return buf.sum(dtype=jnp.int32).astype(jnp.float32)

    from isee3_decoder_tpu.ops.carrier import pm_demod_scan
    from isee3_decoder_tpu.ops import prefix_pallas

    @jax.jit
    def pm_blocks_csum(rb):
        _, out = pm_demod_scan(init_carry(B, cfg.pm), rb, cfg.pm)
        csum = prefix_pallas.prefix_sum_blocks(out.baseband)
        return csum[:, ::997].sum(dtype=jnp.int32).astype(jnp.float32)

    bench("pm_blockscan+csum", pm_blocks_csum, blocks)
    bench("pm_scan_csum", pm_csum_only, blocks)
    bench("pm+symdemod(tracked)", pm_sym, blocks)
    bench("demod_to_symbols", demod_full, iq)
    bench("full_chain_device", chain, iq)
    print(json.dumps({"nwindows": nwindows, "nblocks": nblocks}), flush=True)


if __name__ == "__main__":
    main()
