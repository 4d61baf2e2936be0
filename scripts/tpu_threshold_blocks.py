"""Per-block breakdown of the threshold regime: serial vs pipelined.

The bench records threshold t_block as the 4-block pipelined average,
which came out 2.7x the warm single-block serial repeat (4.85 vs 1.75 s
on 2026-08-21).  This probe times each of the SAME four blocks serially
(warm) and then the pipelined driver, printing per-block wall time,
decoder mix, and tier-2 straggler counts — separating intrinsic
noise-dependent fallback load from pipelined-driver overhead.

Run: JAX_COMPILATION_CACHE_DIR=$PWD/build/jax_cache \
     JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
     python scripts/tpu_threshold_blocks.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "build", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from isee3_decoder_tpu.models.decode import (
    DECODER_FANO,
    DECODER_QLEC,
    DECODER_QUICKLOOK,
    DECODER_VITERBI,
    DecodeConfig,
)
from isee3_decoder_tpu.models.pipeline import (
    PipelineConfig,
    receive_block,
    receive_blocks_pipelined,
)
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal
from isee3_decoder_tpu.utils.devicesignal import synthesize_iq_device


def main() -> None:
    samprate, symrate = 250_000.0, 1024.0
    nchan = int(os.environ.get("BENCH_NCHAN", "128"))
    nframes = 4
    seconds = (nframes * 2048 + 400) / symrate
    nsamples = int(seconds * samprate)
    noise_thr = float(os.environ.get("BENCH_NOISE_STD3", "110000"))

    rng = np.random.default_rng(0)
    frames = testsignal.random_frames(rng, nframes)
    frames_dev = jnp.asarray(np.broadcast_to(frames, (nchan, *frames.shape)))
    carriers = jnp.asarray(20_000.0 + 137.0 * np.arange(nchan), jnp.float32)

    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=4.0, search_width=200.0),
        sym=SymConfig(samprate=samprate, symrate=symrate),
        decode=DecodeConfig(
            viterbi_backend="fused",
            fano_tier1_maxcycles=int(os.environ.get("BENCH_TIER1", "12")),
        ),
    )

    @jax.jit
    def to_raw(iq):
        ri = jnp.stack([iq.real, iq.imag], axis=-1).reshape(iq.shape[0], -1)
        return jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)

    npipe = 4
    keys_t = jax.random.split(jax.random.PRNGKey(1234), npipe)
    iqs = [
        to_raw(
            synthesize_iq_device(
                frames_dev, carriers, k, nsamples,
                samprate=samprate, symrate=symrate, noise_std=noise_thr,
            )
        )
        for k in keys_t
    ]
    _ = float(iqs[-1][0, 0])
    # bench derives f_avail from find_sync on the clean regime; its
    # recorded frames_possible=256 at nchan=128 means f_avail=2
    f_avail = 2

    def mix(rec):
        return {
            "ql": int((rec.decoder == DECODER_QUICKLOOK).sum()),
            "qlec": int((rec.decoder == DECODER_QLEC).sum()),
            "fano": int((rec.decoder == DECODER_FANO).sum()),
            "vit": int((rec.decoder == DECODER_VITERBI).sum()),
            "good": int(rec.good.sum()),
        }

    # warm every block's program once (all shapes identical, so this is
    # one compile + three cache hits) and tier-2 shapes via block 0
    receive_block(iqs[0], f_avail, cfg)

    print("== serial (warm), per block ==")
    t_ser = []
    for i, iq in enumerate(iqs):
        t0 = time.perf_counter()
        rec, _ss = receive_block(iq, f_avail, cfg)
        dt = time.perf_counter() - t0
        t_ser.append(dt)
        print(f"block {i}: {dt:6.3f} s  {mix(rec)}")
    print(f"serial mean: {np.mean(t_ser):.3f} s")

    print("== pipelined driver (same blocks) ==")
    t0 = time.perf_counter()
    stamps = []
    for rec, _ss in receive_blocks_pipelined(iqs, f_avail, cfg):
        stamps.append(time.perf_counter() - t0)
    t_pipe = stamps[-1] / npipe
    deltas = [stamps[0]] + [b - a for a, b in zip(stamps, stamps[1:])]
    print(f"yield deltas: {[f'{d:.3f}' for d in deltas]}")
    print(f"pipelined mean: {t_pipe:.3f} s  (serial mean {np.mean(t_ser):.3f})")


if __name__ == "__main__":
    main()
