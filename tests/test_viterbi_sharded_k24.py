"""Production-scale validation of the state-sharded Viterbi (SURVEY §2.5).

The perfect-shuffle ppermute exchange (parallel/viterbi_sharded.py) is
exercised at the REAL MCQLI-24 lattice — 2^23 states sharded over the
8-device mesh, 32 MB of metrics, 1 GB of decisions for a full frame —
and must be bit-identical to the unsharded reference kernel on a noisy
frame (reference lattice: viterbi224_sse2.c:296-327; usage
decode.c:216-230).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.config import MCQLI24, SYNC_STATE
from isee3_decoder_tpu.ops import viterbi as vit
from isee3_decoder_tpu.ops.encode import encode_bits
from isee3_decoder_tpu.parallel import decode_frame_sharded, make_mesh


def _noisy_frame(rng, nbits, start, end_tail):
    bits = rng.integers(0, 2, (1, nbits), dtype=np.uint8)
    for j in range(MCQLI24.k - 1):
        bits[:, nbits - 1 - j] = (end_tail >> j) & 1
    syms, _ = encode_bits(jnp.asarray(bits), start, MCQLI24)
    soft = np.where(np.asarray(syms) > 0, 168.0, 88.0)
    soft = soft + rng.normal(0, 28.0, soft.shape)  # Eb/N0 ≈ 4.1 dB
    return bits, np.clip(soft, 0, 255).astype(np.uint8)


def test_k24_sharded_matches_unsharded_small():
    """2^23-state lattice over 8 devices, short noisy frame — always run."""
    mesh = make_mesh(n_channels_axis=1, n_state_axis=8)
    rng = np.random.default_rng(77)
    nbits = 96
    bits, soft = _noisy_frame(rng, nbits, 0, 0)
    got = np.asarray(
        decode_frame_sharded(jnp.asarray(soft), mesh, nbits, 0, 0, MCQLI24)
    )
    want = np.asarray(vit.decode_frame(jnp.asarray(soft), nbits, 0, 0, MCQLI24))
    np.testing.assert_array_equal(got, want)
    # sanity: the channel is noisy enough that hard decisions have errors
    hard = (soft > 128).astype(np.uint8)
    resyms, _ = encode_bits(jnp.asarray(bits), 0, MCQLI24)
    assert (hard != np.asarray(resyms)).sum() > 3


@pytest.mark.slow
def test_k24_sharded_full_1024bit_frame():
    """One full 1024-bit MCQLI-24 frame with the decode.c boundary states
    (init/end 0x819fbe), sharded vs unsharded, bit-for-bit (VERDICT r1 #2).
    ~1 GB of sharded decisions; several minutes on the 2-core CPU mesh.
    """
    mesh = make_mesh(n_channels_axis=1, n_state_axis=8)
    rng = np.random.default_rng(78)
    nbits = 1024
    tail = SYNC_STATE  # low 23 bits of the syncword
    bits, soft = _noisy_frame(rng, nbits, SYNC_STATE, tail)
    got = np.asarray(
        decode_frame_sharded(
            jnp.asarray(soft), mesh, nbits, SYNC_STATE, SYNC_STATE, MCQLI24
        )
    )
    want = np.asarray(
        vit.decode_frame(jnp.asarray(soft), nbits, SYNC_STATE, SYNC_STATE, MCQLI24)
    )
    np.testing.assert_array_equal(got, want)
    # at this Eb/N0 the decode is also error-free — the decoded frame is
    # the transmitted one (the reference's operating regime)
    np.testing.assert_array_equal(got, bits)
