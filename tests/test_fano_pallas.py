"""Full-walk Pallas Fano kernel (ops/fano_pallas.py) vs the XLA walk.

Same validation pattern as the reference's vtest224sse/vtest224port
cross-implementation check (SURVEY.md §4.2): the XLA lockstep walk is
the oracle (itself oracle-validated against the fano.c transliteration
in test_fano.py); the Pallas kernel must match bit-for-bit — including
timed-out lanes' partial bits, metrics and cycle counts.

Runs in interpreter mode on the CPU backend (the kernel compiles for
real only on TPU; fano_decode auto-dispatches there).
"""

import numpy as np
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.config import CODES, CodeSpec
from isee3_decoder_tpu.ops.encode import encode_bits
from isee3_decoder_tpu.ops.fano import FanoParams, _fano_decode_packed
from isee3_decoder_tpu.ops import fano_pallas
from isee3_decoder_tpu.utils.metrics import gen_met

K7 = CodeSpec("TESTK7", 0o171, 0o133, 7, 0, 0)


def _noisy_batch(rng, code, nbits, B, sigma, start, tail):
    softs = []
    for _ in range(B):
        bits = rng.integers(0, 2, nbits, dtype=np.uint8)
        for j in range(code.k - 1):
            bits[nbits - 1 - j] = (tail >> j) & 1
        syms, _ = encode_bits(jnp.asarray(bits[None, :]), start, code)
        s = np.asarray(syms[0], np.int32)
        soft = np.clip(
            np.round((s * 2 - 1) * 100 + rng.normal(0, sigma, 2 * nbits))
            + 128,
            0,
            255,
        ).astype(np.uint8)
        softs.append(soft)
    return np.stack(softs)


def _assert_equal(r_x, r_p):
    for f in ["bits", "goodbits", "metric", "cycles"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(r_x, f)), np.asarray(getattr(r_p, f)), f
        )


def test_pallas_walk_matches_xla_cliff():
    """Heavy noise: deep pop-runs, toggles, relaxes and timeouts."""
    rng = np.random.default_rng(23)
    nbits = 64
    mettab = jnp.asarray(gen_met(100.0, 60.0, 0.5, 8.0))
    params = FanoParams(delta=32, maxcycles=6, unroll=2)
    softs = jnp.asarray(_noisy_batch(rng, K7, nbits, 6, 85.0, 0x2A, 0x15))
    r_x = _fano_decode_packed(
        softs, mettab, nbits, 0x2A, 0x15, K7, params
    )
    r_p = fano_pallas.fano_decode_pallas(
        softs, mettab, nbits, 0x2A, 0x15, K7, params, interpret=True
    )
    _assert_equal(r_x, r_p)
    assert (np.asarray(r_x.goodbits) != nbits).any(), "no lane timed out"


def test_pallas_walk_matches_xla_moderate_and_skip():
    """Moderate noise (most lanes decode) plus skip lanes starting done."""
    rng = np.random.default_rng(31)
    nbits = 64
    mettab = jnp.asarray(gen_met(100.0, 47.0, 0.5, 8.0))
    params = FanoParams(delta=32, maxcycles=12, unroll=2)
    softs = jnp.asarray(_noisy_batch(rng, K7, nbits, 5, 47.0, 0x2A, 0x15))
    skip = jnp.asarray([False, True, False, False, True])
    r_x = _fano_decode_packed(
        softs, mettab, nbits, 0x2A, 0x15, K7, params, skip=skip
    )
    r_p = fano_pallas.fano_decode_pallas(
        softs, mettab, nbits, 0x2A, 0x15, K7, params, skip=skip,
        interpret=True,
    )
    sk = np.asarray(skip)
    for f in ["bits", "goodbits", "metric", "cycles"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(r_x, f))[~sk],
            np.asarray(getattr(r_p, f))[~sk],
            f,
        )
    assert (np.asarray(r_x.goodbits)[~sk] == nbits).any()


def test_supports_gate():
    from isee3_decoder_tpu.config import DEFAULT_CODE, CODES

    assert fano_pallas.supports(1024, 256, DEFAULT_CODE)
    assert not fano_pallas.supports(1024, 512, DEFAULT_CODE)  # lanes cap
    assert not fano_pallas.supports(1024, 16, CODES["MCQLI32"])  # wide
