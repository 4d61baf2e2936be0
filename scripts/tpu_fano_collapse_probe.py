"""Measure the collapsed-backtrack Fano walk (round 5) on a
TIMEOUT-bound batch — the threshold regime's tier-2 cost.

The r4 step-by-step walk measured ~6 us/micro-step at unroll 16 with
~2x micro-steps per forward look near the cliff (pure-noise lanes spend
most steps backtracking).  The collapse resolves every backtrack run in
the same micro-step as the violating look, so micro-steps == forward
looks; this probe records seconds per forward look directly.

Usage: PROBE_B=256 PROBE_MAXC=20 python scripts/tpu_fano_collapse_probe.py
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

from isee3_decoder_tpu.config import FRAMEBITS, SYNC_STATE, SYNCWORD, MCQLI24
from isee3_decoder_tpu.models.decode import DecodeConfig
from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode

rng = np.random.default_rng(3)
B = int(os.environ.get("PROBE_B", "256"))
# pure noise symbols: every lane times out at the full budget
soft = jnp.asarray(rng.integers(0, 256, (B, 2 * FRAMEBITS), dtype=np.uint8))
mettab = jnp.asarray(DecodeConfig().mettab())
tail = SYNCWORD & ((1 << (MCQLI24.k - 1)) - 1)
maxc = int(os.environ.get("PROBE_MAXC", "20"))  # cycles/bit (scaled-down budget)

for unroll in [int(u) for u in os.environ.get("PROBE_UNROLL", "4,8,16,32").split(",")]:
    params = FanoParams(maxcycles=maxc, unroll=unroll)
    res = fano_decode(soft, mettab, FRAMEBITS, SYNC_STATE, tail, MCQLI24, params)
    _ = int(res.cycles.sum())  # warm
    t0 = time.perf_counter()
    res = fano_decode(soft, mettab, FRAMEBITS, SYNC_STATE, tail, MCQLI24, params)
    tot = int(res.cycles.max())
    dt = time.perf_counter() - t0
    print(
        f"B {B} unroll {unroll:3d}: {dt:7.3f} s  ({tot} fwd looks; "
        f"{1e6 * dt / tot:5.1f} us/fwd-look)",
        flush=True,
    )
