"""Statistical regression tests: channel + decoders vs theory.

The reference's harnesses print results for eyeball comparison against
theoretical BER (fanotest.c:99-100); here the comparisons are asserted
with seeded PRNGs (SURVEY.md §4).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.config import MCQLI24
from isee3_decoder_tpu.ops import encode_bits
from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode
from isee3_decoder_tpu.utils import ebn0_to_noise, gen_met, simulate


def test_channel_hard_ber_matches_theory():
    """Hard-decision symbol error rate of the 8-bit quantized channel
    must track 0.5*erfc(sqrt(Es/N0)) over a range of SNRs."""
    signal = 60.0
    key = jax.random.PRNGKey(0)
    n = 400_000
    for esn0_db in (-1.0, 1.0, 3.0):
        noise = signal / (10 ** (esn0_db / 20.0)) / math.sqrt(2.0)
        key, sub = jax.random.split(key)
        rx = np.asarray(simulate(sub, jnp.zeros(n, jnp.uint8), signal, noise))
        ser = (rx > 128).mean()
        # theory: P(err) = Q(signal/noise) = 0.5*erfc(signal/(noise*sqrt(2)))
        want = 0.5 * math.erfc(signal / (noise * math.sqrt(2.0)))
        assert abs(ser - want) < 0.25 * want + 2e-4, (esn0_db, ser, want)


def test_fano_operating_point_mcqli24():
    """At Eb/N0 = 3.5 dB (above the ~2.5 dB Fano threshold, CHANGES:21)
    full 1024-bit MCQLI-24 frames decode with low deletion rate, no
    undetected errors, and modest cycles/bit."""
    nbits = 1024
    signal = 100.0
    ebn0 = 3.5
    noise = ebn0_to_noise(signal, ebn0)
    mettab = jnp.asarray(gen_met(signal, noise, 0.5, 8.0))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    trials = 24
    bits = np.zeros((trials, nbits), np.uint8)
    bits[:, : nbits - 64] = rng.integers(0, 2, (trials, nbits - 64))
    syms, _ = encode_bits(jnp.asarray(bits), 0, MCQLI24)
    rx = simulate(key, syms, signal, noise)
    res = fano_decode(rx, mettab, nbits, 0, 0, MCQLI24, FanoParams(32, 200))

    finished = np.asarray(res.goodbits) == nbits
    errs = (np.asarray(res.bits) != bits).any(axis=1)
    undetected = finished & errs
    assert undetected.sum() == 0
    assert finished.mean() >= 0.75, f"deletion rate {1 - finished.mean():.2f}"
    cycles_per_bit = np.asarray(res.cycles)[finished].mean() / nbits
    assert cycles_per_bit < 10, cycles_per_bit
