"""Find the Fano-threshold noise level where the Viterbi fallback engages.

Sweeps BENCH-shaped noise levels on the real chip, printing per-level
decoder shares and block times.  VERDICT r3 missing #1: no recorded perf
number had ever exercised the Viterbi fallback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "build", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.config import FRAMESYMBOLS, SYNCBITS
from isee3_decoder_tpu.models.decode import (
    DECODER_FANO,
    DECODER_QUICKLOOK,
    DECODER_VITERBI,
    DecodeConfig,
    decode_block,
)
from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.ops.syncword import find_sync
from isee3_decoder_tpu.utils import testsignal
from isee3_decoder_tpu.utils.devicesignal import synthesize_iq_device

samprate, symrate = 250_000.0, 1024.0
nchan = int(os.environ.get("PROBE_NCHAN", "32"))
nframes = 4
seconds = (nframes * 2048 + 400) / symrate
nsamples = int(seconds * samprate)

rng = np.random.default_rng(0)
frames = testsignal.random_frames(rng, nframes)
frames_dev = jnp.asarray(np.broadcast_to(frames, (nchan, *frames.shape)))
carriers = jnp.asarray(20_000.0 + 137.0 * np.arange(nchan), jnp.float32)

cfg = PipelineConfig(
    pm=PMConfig(samprate=samprate, binsize=4.0, search_width=200.0),
    sym=SymConfig(samprate=samprate, symrate=symrate),
    decode=DecodeConfig(viterbi_backend="inplace", fano_tier1_maxcycles=12),
)


@jax.jit
def to_raw(iq):
    ri = jnp.stack([iq.real, iq.imag], axis=-1).reshape(iq.shape[0], -1)
    return jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)


@jax.jit
def demod(iq):
    soft, bb, freq, cn0 = demod_to_symbols(iq, cfg)
    return soft, cn0[-1].min()


levels = [float(v) for v in os.environ.get(
    "PROBE_NOISE", "50000,65000,80000,95000,110000"
).split(",")]

for noise in levels:
    key = jax.random.PRNGKey(7)
    iq = to_raw(
        synthesize_iq_device(
            frames_dev, carriers, key, nsamples,
            samprate=samprate, symrate=symrate, noise_std=noise,
        )
    )
    soft, cn0_min = demod(iq)
    soft_np = np.asarray(soft)
    ss, _ = find_sync(soft[:, : FRAMESYMBOLS + SYNCBITS], FRAMESYMBOLS)
    ss_np = np.asarray(ss, np.int64)
    f_avail = int((soft_np.shape[1] - ss_np.max() - SYNCBITS) // FRAMESYMBOLS)
    decode_block(soft, f_avail, cfg.decode)  # warm
    t0 = time.perf_counter()
    rec, _ = decode_block(soft, f_avail, cfg.decode)
    dt = time.perf_counter() - t0
    d = rec.decoder
    g = rec.good
    m = rec.data.reshape(nchan, f_avail, -1)
    gm = g.reshape(nchan, f_avail)
    matched = sum(
        1
        for ch in range(nchan)
        for f in range(f_avail)
        if gm[ch, f] and any(np.array_equal(m[ch, f], fr) for fr in frames)
    )
    print(
        f"noise {noise:>8.0f}  cn0_min {float(cn0_min):5.1f}  t_decode {dt:7.3f}s  "
        f"ql {int((d == DECODER_QUICKLOOK).sum()):3d}  "
        f"fano {int((d == DECODER_FANO).sum()):3d}  "
        f"vit {int((d == DECODER_VITERBI).sum()):3d}  "
        f"good {int(g.sum()):3d}/{f_avail * nchan}  matched {matched}",
        flush=True,
    )
