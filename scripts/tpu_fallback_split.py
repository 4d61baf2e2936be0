"""Cost split of the fallback tiers at the Fano threshold."""

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
from isee3_decoder_tpu.models import decode as D
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
    decode=D.DecodeConfig(
        viterbi_backend=os.environ.get("PROBE_VBACKEND", "inplace"),
        fano_tier1_maxcycles=12,
        qlec=os.environ.get("PROBE_QLEC", "0") == "1",
    ),
)

noise = float(os.environ.get("PROBE_NOISE1", "110000"))

@jax.jit
def to_raw(iq):
    ri = jnp.stack([iq.real, iq.imag], axis=-1).reshape(iq.shape[0], -1)
    return jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)

@jax.jit
def demod(iq):
    soft, bb, freq, cn0 = demod_to_symbols(iq, cfg)
    return soft, cn0[-1].min()

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
dcfg = cfg.decode

for attempt in range(2):  # first pass warms all compiles
    t0 = time.perf_counter()
    buf = np.asarray(D.decode_block_device(soft, f_avail, FRAMESYMBOLS, dcfg))
    t_dev = time.perf_counter() - t0
    data, good, decoder, ok, cycles, ss2 = D.unpack_block_buffer(buf, nchan, f_avail)
    starts = ss2[:, None] + SYNCBITS + FRAMESYMBOLS * np.arange(f_avail)[None, :]
    n_fail1 = int((~ok).sum())
    t0 = time.perf_counter()
    D.fano_tier2_inplace(data, good, decoder, ok, cycles, starts, soft_np, f_avail, dcfg)
    t_t2 = time.perf_counter() - t0
    n_fail2 = int((~ok).sum())
    t0 = time.perf_counter()
    D.viterbi_fallback_inplace(data, good, decoder, ok, starts, soft_np, f_avail, dcfg)
    t_vit = time.perf_counter() - t0
    print(
        f"pass {attempt}: t_device {t_dev:.3f}s  tier1_fail {n_fail1}  "
        f"t_tier2_fano {t_t2:.3f}s  tier2_fail {n_fail2}  t_viterbi {t_vit:.3f}s  "
        f"good {int(good.sum())}/{nchan * f_avail}",
        flush=True,
    )
