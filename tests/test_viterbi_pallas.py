"""Pallas ACS kernel equivalence tests (interpret mode on CPU).

The port-vs-optimized cross-validation pattern of the reference
(vtest224sse vs vtest224port, SURVEY.md §4.2): the Pallas kernel must be
bit-identical to the jnp reference kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isee3_decoder_tpu.config import CodeSpec
from isee3_decoder_tpu.ops import encode_bits, viterbi
from isee3_decoder_tpu.ops.viterbi_pallas import (
    acs_step_pallas,
    decode_frame_pallas,
    update_blk_pallas,
)

K15 = CodeSpec("TESTK15", 0o46321, 0o51445, 15, 0, 1)


def make_noisy(rng, code, nbits):
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(code.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, code)
    noisy = np.clip(
        np.where(np.asarray(syms) > 0, 170, 86).astype(np.int32)
        + rng.integers(-80, 80, 2 * nbits),
        0, 255,
    ).astype(np.uint8)
    return bits, noisy


@pytest.mark.parametrize("tile_rows", [16, 32, 64])
def test_pallas_decode_matches_jnp(tile_rows):
    rng = np.random.default_rng(tile_rows)
    nbits = 96
    bits, noisy = make_noisy(rng, K15, nbits)
    want = np.asarray(viterbi.decode_frame(jnp.asarray(noisy), nbits, 0, 0, K15))
    got = np.asarray(
        decode_frame_pallas(
            jnp.asarray(noisy), nbits, 0, 0, K15, tile_rows=tile_rows, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_batched_and_metrics_match():
    rng = np.random.default_rng(7)
    nbits = 48
    B = 3
    streams = [make_noisy(rng, K15, nbits)[1] for _ in range(B)]
    noisy = jnp.asarray(np.stack(streams))

    st_ref = viterbi.create(nbits, B, K15, 0, jnp.int16)
    st_ref = viterbi.update_blk(st_ref, noisy, K15)
    st_pal = viterbi.create(nbits, B, K15, 0, jnp.int16)
    st_pal = update_blk_pallas(st_pal, noisy, K15, tile_rows=32, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(st_pal.decisions), np.asarray(st_ref.decisions)
    )
    np.testing.assert_array_equal(
        np.asarray(st_pal.metrics), np.asarray(st_ref.metrics)
    )
    np.testing.assert_array_equal(
        np.asarray(viterbi.min_metric(st_pal)), np.asarray(viterbi.min_metric(st_ref))
    )
