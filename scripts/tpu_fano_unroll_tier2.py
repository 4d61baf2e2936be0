"""Unroll sweep on a TIMEOUT-bound Fano walk (the threshold regime's
tier-2 cost): hopeless lanes walk the full 100-cycles/bit budget."""

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

from isee3_decoder_tpu.config import FRAMEBITS, SYNC_STATE, SYNCWORD, MCQLI24
from isee3_decoder_tpu.models.decode import DecodeConfig
from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode

rng = np.random.default_rng(3)
B = 16
# pure noise symbols: every lane times out at the full budget
soft = jnp.asarray(rng.integers(0, 256, (B, 2 * FRAMEBITS), dtype=np.uint8))
mettab = jnp.asarray(DecodeConfig().mettab())
tail = SYNCWORD & ((1 << (MCQLI24.k - 1)) - 1)
maxc = int(os.environ.get("PROBE_MAXC", "20"))  # cycles/bit (scaled-down budget)

for unroll in [int(u) for u in os.environ.get("PROBE_UNROLL", "8,16,32,64").split(",")]:
    params = FanoParams(maxcycles=maxc, unroll=unroll)
    res = fano_decode(soft, mettab, FRAMEBITS, SYNC_STATE, tail, MCQLI24, params)
    _ = int(res.cycles.sum())  # warm
    t0 = time.perf_counter()
    res = fano_decode(soft, mettab, FRAMEBITS, SYNC_STATE, tail, MCQLI24, params)
    tot = int(res.cycles.max())
    dt = time.perf_counter() - t0
    print(
        f"unroll {unroll:3d}: {dt:7.3f} s  ({tot} fwd looks; "
        f"{1e6 * dt / (2.0 * tot):5.1f} us/micro-step est)",
        flush=True,
    )
