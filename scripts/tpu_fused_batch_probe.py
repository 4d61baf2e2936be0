"""frames/s of the fused full-frame Viterbi decode vs batch size.

The planes decision path (no relayout copy) admits B=8 on a 16 GB v5e;
this measures whether bigger batches actually buy throughput (the
kernels are VPU-compute-bound, so gains should taper).
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

from isee3_decoder_tpu.config import FRAMEBITS, MCQLI24, SYNC_STATE
from isee3_decoder_tpu.ops.viterbi_pallas_fused import decode_frame_fused

rng = np.random.default_rng(0)
reps = int(os.environ.get("PROBE_REPS", "2"))
for B in [int(x) for x in os.environ.get("PROBE_B", "1,2,4,8").split(",")]:
    syms = jnp.asarray(
        rng.integers(0, 256, (B, 2 * FRAMEBITS), dtype=np.uint8)
    )
    bits = decode_frame_fused(syms, FRAMEBITS, SYNC_STATE, SYNC_STATE, MCQLI24)
    _ = int(bits.sum())  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        bits = decode_frame_fused(syms, FRAMEBITS, SYNC_STATE, SYNC_STATE, MCQLI24)
        _ = int(bits.sum())
    dt = (time.perf_counter() - t0) / reps
    print(
        f"B={B}: {dt:6.3f} s/call  {B / dt:6.2f} frames/s  "
        f"{B * FRAMEBITS / dt:8.0f} frame-bit/s",
        flush=True,
    )
