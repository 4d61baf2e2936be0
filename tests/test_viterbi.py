"""Viterbi kernel tests.

Strategy (SURVEY.md §4.2): the vectorized kernel is validated against a
direct trellis-walk oracle (the viterbi224_port.c role), on a small
constraint length where exhaustive comparison is cheap, plus K=24 smoke
and round-trip tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isee3_decoder_tpu.config import MCQLI24, CodeSpec, parity
from isee3_decoder_tpu.ops import encode_bits
from isee3_decoder_tpu.ops import viterbi
from isee3_decoder_tpu.utils import ebn0_to_noise, simulate

# Small code for exhaustive oracle comparison (CCSDS K=7 polynomials).
K7 = CodeSpec("TESTK7", 0o171, 0o133, 7, 0, 0)
# A small code with an inverted output, to exercise G2FLIP like MCQLI24.
K9F = CodeSpec("TESTK9F", 0o713, 0o715, 9, 0, 1)


def oracle_decode(syms, nbits, start_state, end_state, code):
    """Plain trellis walk with the SSE2 tie-break (m0 > m1 selects the
    1-branch survivor), used as a correctness oracle."""
    ns = code.nstates
    half = ns // 2
    i = np.arange(half)
    b0 = np.array([code.g1flip ^ parity((2 * int(x)) & code.poly1) for x in i])
    b1 = np.array([code.g2flip ^ parity((2 * int(x)) & code.poly2) for x in i])

    metrics = np.full(ns, viterbi.START_BIAS, np.int64)
    metrics[start_state & code.state_mask] = 0
    decisions = np.zeros((nbits, ns), np.uint8)
    for t in range(nbits):
        s0, s1 = int(syms[2 * t]), int(syms[2 * t + 1])
        bm = np.where(b0, 255 - s0, s0) + np.where(b1, 255 - s1, s1)
        m0 = metrics[:half] + bm
        m1 = metrics[half:] + (510 - bm)
        m2 = metrics[:half] + (510 - bm)
        m3 = metrics[half:] + bm
        d0 = m0 > m1
        d1 = m2 > m3
        new = np.empty(ns, np.int64)
        new[0::2] = np.minimum(m0, m1)
        new[1::2] = np.minimum(m2, m3)
        decisions[t, 0::2] = d0
        decisions[t, 1::2] = d1
        metrics = new - new.min()

    # chainback
    state = end_state & code.state_mask
    bits = np.zeros(nbits, np.uint8)
    for t in range(nbits - 1, -1, -1):
        bits[t] = state & 1
        b = decisions[t, state]
        state = (int(b) << (code.k - 2)) | (state >> 1)
    return bits, metrics


def tx_soft(symbols, amp=100):
    """Map 0/1 channel symbols to clean offset-binary soft decisions."""
    return np.where(np.asarray(symbols) > 0, 128 + amp, 128 - amp).astype(np.uint8)


@pytest.mark.parametrize("code", [K7, K9F])
def test_kernel_matches_oracle_noisy(code):
    rng = np.random.default_rng(7)
    nbits = 96
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(code.k - 1):] = 0
    syms, endstate = encode_bits(jnp.asarray(bits), 0, code)
    # Heavy noise so survivor comparisons are nontrivial
    noisy = np.clip(
        np.asarray(tx_soft(np.asarray(syms), amp=40), np.int32)
        + rng.integers(-90, 90, 2 * nbits),
        0,
        255,
    ).astype(np.uint8)

    want_bits, _ = oracle_decode(noisy, nbits, 0, 0, code)
    got = viterbi.decode_frame(jnp.asarray(noisy), nbits, 0, 0, code)
    np.testing.assert_array_equal(np.asarray(got)[0], want_bits)


def test_roundtrip_clean_k7():
    rng = np.random.default_rng(11)
    nbits = 128
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(K7.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, K7)
    got = viterbi.decode_frame(jnp.asarray(tx_soft(np.asarray(syms))), nbits, 0, 0, K7)
    np.testing.assert_array_equal(np.asarray(got)[0], bits)


def test_roundtrip_noisy_k7_batch():
    """Batched decode at moderate SNR recovers all frames."""
    rng = np.random.default_rng(13)
    B, nbits = 4, 128
    bits = rng.integers(0, 2, (B, nbits), dtype=np.uint8)
    bits[:, -(K7.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, K7)
    signal = 80.0
    noise = ebn0_to_noise(signal, 5.0)
    rx = simulate(jax.random.PRNGKey(0), syms, signal, noise)
    got = viterbi.decode_frame(rx, nbits, 0, 0, K7)
    np.testing.assert_array_equal(np.asarray(got), bits)


def test_known_start_end_states():
    """Nonzero boundary states (the decode.c:220-222 usage: sync state
    0x819fbe on both ends) are honored."""
    rng = np.random.default_rng(17)
    nbits = 64
    start = 0x155 & K9F.state_mask
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    syms, endstate = encode_bits(jnp.asarray(bits), start, K9F)
    end = int(endstate) & K9F.state_mask
    got = viterbi.decode_frame(
        jnp.asarray(tx_soft(np.asarray(syms))), nbits, start, end, K9F
    )
    np.testing.assert_array_equal(np.asarray(got)[0], bits)


def test_mcqli24_smoke():
    """Full 2**23-state kernel on a short frame (memory-heavy; 64 steps)."""
    rng = np.random.default_rng(19)
    nbits = 64
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(MCQLI24.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, MCQLI24)
    signal = 80.0
    noise = ebn0_to_noise(signal, 6.0)
    rx = simulate(jax.random.PRNGKey(3), syms, signal, noise)
    got = viterbi.decode_frame(rx, nbits, 0, 0, MCQLI24)
    np.testing.assert_array_equal(np.asarray(got)[0], bits)


def test_streaming_decodebit_matches_block():
    """Fixed-delay streaming mode (vdecode.c:145-152): with a circular
    tape, decodebit after each symbol pair reproduces the block decode."""
    rng = np.random.default_rng(23)
    nbits, delay = 96, 32
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(K7.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, K7)
    soft = tx_soft(np.asarray(syms))

    st = viterbi.create(delay + 1, 1, K7, 0)
    out = []
    for t in range(nbits):
        st = viterbi.update_blk(st, jnp.asarray(soft[2 * t : 2 * t + 2]), K7)
        if t >= delay:
            out.append(int(viterbi.decodebit(st, delay, 0, K7)[0]))
    # The decision bit at trellis step n is the input bit from K-1 steps
    # earlier (it is the top bit of the surviving source state), so
    # decodebit at time t returns bit b_{t - delay - (K-2)}.  The first
    # K-2 outputs predate the frame (vdecode handles this with its
    # startup_delay suppression, vdecode.c:92,151-157).
    lag = K7.k - 2
    np.testing.assert_array_equal(
        np.array(out[lag:]), bits[: nbits - delay - lag]
    )


def test_renorm_invariance():
    """Metric renormalization must not change decisions: min_metric grows
    with renorm while decoded bits stay identical across signal scales."""
    rng = np.random.default_rng(29)
    nbits = 200
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(K7.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, K7)
    soft = tx_soft(np.asarray(syms), amp=120)
    st = viterbi.create(nbits, 1, K7, 0)
    st = viterbi.update_blk(st, jnp.asarray(soft), K7)
    assert int(viterbi.min_metric(st)[0]) >= 0
    assert int(viterbi.max_metric(st)[0]) >= int(viterbi.min_metric(st)[0])
    got = viterbi.chainback(st, nbits, 0, K7)
    np.testing.assert_array_equal(np.asarray(got)[0], bits)
