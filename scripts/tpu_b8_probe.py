"""Confirm the B=8 fused-kernel root cause on hardware: with a frame
short enough that the decision tape fits HBM, B=8 compiles and decodes
correctly — the round-1 'wedge' was decision-memory OOM, not a Mosaic
batch limitation (see ops/viterbi_pallas_fused._check_decision_budget).

Run: python scripts/tpu_b8_probe.py   (on the axon TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from isee3_decoder_tpu.config import MCQLI24
from isee3_decoder_tpu.ops.encode import encode_bits
from isee3_decoder_tpu.ops.viterbi_pallas_fused import decode_frame_fused

B = 8
NBITS = 46  # 2 fused cycles; decisions 2*8*46*1MB ≈ 0.8 GB peak

rng = np.random.default_rng(0)
bits = rng.integers(0, 2, (B, NBITS), dtype=np.uint8)
bits[:, -(MCQLI24.k - 1):] = 0
syms, _ = encode_bits(jnp.asarray(bits), 0, MCQLI24)
soft = np.where(np.asarray(syms) > 0, 200, 56).astype(np.uint8)

t0 = time.perf_counter()
out = decode_frame_fused(jnp.asarray(soft), NBITS, 0, 0, MCQLI24)
out = np.asarray(out)
t1 = time.perf_counter()
print(f"B=8 fused decode ({NBITS} bits): {t1 - t0:.2f}s incl compile; "
      f"match={np.array_equal(out, bits)}")

# steady-state timing
t0 = time.perf_counter()
out2 = np.asarray(decode_frame_fused(jnp.asarray(soft), NBITS, 0, 0, MCQLI24))
t1 = time.perf_counter()
print(f"steady: {t1 - t0:.3f}s -> {B * NBITS / (t1 - t0):.0f} frame-bit/s")
