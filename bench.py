"""Benchmark: full receive-chain throughput, reported as 250 ksps
channels decodable in real time per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference C chain processes (optimistically) one 250 ksps
channel in real time on a CPU core when Fano succeeds, and falls behind
real time whenever the Viterbi fallback engages (CHANGES:9).  We
normalize vs_baseline against 1.0 channel.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("BENCH_CPU", "") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from isee3_decoder_tpu.models.decode import DecodeConfig, decode_stream
    from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
    from isee3_decoder_tpu.ops.carrier import PMConfig
    from isee3_decoder_tpu.ops.symbols import SymConfig
    from isee3_decoder_tpu.utils import testsignal

    small = os.environ.get("BENCH_SMALL", "") == "1"
    samprate = 250_000.0
    symrate = 1024.0
    nchan = 4 if small else 32
    seconds = 2.2 if small else 8.4  # 4 frames + margin at 512 bps

    rng = np.random.default_rng(0)
    nframes = 1 if small else 4
    frames = testsignal.random_frames(rng, nframes)
    base_iq = testsignal.synthesize_iq(
        frames,
        samprate=samprate,
        symrate=symrate,
        carrier=20_000.0,
        noise_std=2500.0,
        lead_symbols=40,
        rng=rng,
    )
    need = int(seconds * samprate)
    if len(base_iq) < need:
        base_iq = np.tile(base_iq, need // len(base_iq) + 1)
    base_iq = base_iq[:need]
    # distinct channels: frequency-offset copies (independent carrier loops)
    t = np.arange(need)
    chans = np.stack(
        [
            (base_iq * np.exp(1j * 2 * np.pi * (137.0 * c) * t / samprate)).astype(
                np.complex64
            )
            for c in range(nchan)
        ]
    )

    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=4.0, search_width=200.0),
        sym=SymConfig(samprate=samprate, symrate=symrate),
        decode=DecodeConfig(),
    )

    iq_dev = jnp.asarray(chans)

    # Warmup (compile)
    soft, bb, freq, cn0 = demod_to_symbols(iq_dev, cfg)
    jax.block_until_ready(soft)

    t0 = time.perf_counter()
    soft, bb, freq, cn0 = demod_to_symbols(iq_dev, cfg)
    jax.block_until_ready(soft)
    t_demod = time.perf_counter() - t0

    soft_np = np.asarray(soft)
    t0 = time.perf_counter()
    recs, _ = decode_stream(soft_np, cfg.decode)
    t_decode = time.perf_counter() - t0

    total_samples = chans.size
    wall = t_demod + t_decode
    samples_per_sec = total_samples / wall
    channels_realtime = samples_per_sec / samprate

    ngood = int(sum(r.good.sum() for r in recs))
    payload = {
        "metric": "realtime_250ksps_channels_per_chip",
        "value": round(channels_realtime, 2),
        "unit": "channels",
        "vs_baseline": round(channels_realtime / 1.0, 2),
        "detail": {
            "demod_Msamples_per_s": round(samples_per_sec / 1e6, 2),
            "t_demod_s": round(t_demod, 3),
            "t_decode_s": round(t_decode, 3),
            "nchan": nchan,
            "seconds_per_chan": seconds,
            "frames_decoded_good": ngood,
            "frames_total": len(recs) * nchan,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
