"""Fused-cycle Pallas Viterbi kernels vs the reference kernel
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from isee3_decoder_tpu.config import MCQLI24, CodeSpec
from isee3_decoder_tpu.ops import encode_bits, viterbi
from isee3_decoder_tpu.ops.viterbi_pallas_fused import decode_frame_fused

K15 = CodeSpec("TESTK15", 0o46321, 0o51445, 15, 0, 1)


def noisy(rng, code, nbits):
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    bits[-(code.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, code)
    return bits, np.clip(
        np.where(np.asarray(syms) > 0, 170, 86).astype(np.int32)
        + rng.integers(-80, 80, 2 * nbits),
        0, 255,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "nbits",
    [
        9,
        pytest.param(14, marks=pytest.mark.slow),
        42,
        pytest.param(61, marks=pytest.mark.slow),
    ],
)
def test_fused_matches_reference_k15(nbits):
    """Sub-cycle, cycle-aligned, and remainder lengths."""
    rng = np.random.default_rng(nbits)
    bits, rx = noisy(rng, K15, nbits)
    want = np.asarray(viterbi.decode_frame(jnp.asarray(rx), nbits, 0, 0, K15))
    got = np.asarray(
        decode_frame_fused(jnp.asarray(rx), nbits, 0, 0, K15, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_fused_batched_nonzero_states():
    rng = np.random.default_rng(1)
    B, nbits = 2, 30
    rxs, bitss = [], []
    for _ in range(B):
        bits, rx = noisy(rng, K15, nbits)
        rxs.append(rx)
        bitss.append(bits)
    rx = jnp.asarray(np.stack(rxs))
    start, end = 0x0AAA & K15.state_mask, 0
    want = np.asarray(viterbi.decode_frame(rx, nbits, start, end, K15))
    got = np.asarray(
        decode_frame_fused(rx, nbits, start, end, K15, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_fused_mcqli24_smoke():
    rng = np.random.default_rng(2)
    nbits = 48
    bits, rx = noisy(rng, MCQLI24, nbits)
    want = np.asarray(viterbi.decode_frame(jnp.asarray(rx), nbits, 0, 0, MCQLI24))
    got = np.asarray(
        decode_frame_fused(jnp.asarray(rx), nbits, 0, 0, MCQLI24, interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got[0], bits)


def test_streaming_fused_matches_classic():
    """Fused-kernel streaming mode (cycle-aligned chunks into the
    circular tape, erasure-padded final chunk + skip) reproduces the
    classic kernel's fixed-delay outputs."""
    from isee3_decoder_tpu.ops import viterbi_inplace as vip
    from isee3_decoder_tpu.ops.viterbi_pallas_fused import stream_update_fused

    rng = np.random.default_rng(22)
    w = K15.k - 1  # 14
    nbits, delay = 300, 60
    bits = rng.integers(0, 2, nbits, dtype=np.uint8)
    syms, _ = encode_bits(jnp.asarray(bits), 0, K15)
    soft = np.where(np.asarray(syms) > 0, 200, 56).astype(np.uint8)

    chunk = 10 * w  # 140
    tape_len = 2 * chunk  # multiple of chunk, >= skip + chunk + delay
    st = vip.stream_create(tape_len, 1, K15, 0)
    outs, done = [], 0
    while done < nbits:
        n = min(chunk, nbits - done)
        npad = -(-n // w) * w
        block = np.full((1, 2 * npad), 128, np.uint8)
        block[0, : 2 * n] = soft[2 * done : 2 * (done + n)]
        st = stream_update_fused(st, jnp.asarray(block), K15, interpret=True)
        lo = max(delay - done, 0)
        if n - lo > 0:
            outs.append(
                np.asarray(
                    vip.stream_decodebits(st, delay, n - lo, K15, skip=npad - n)
                )
            )
        done += n
    got = np.concatenate(outs, axis=1)

    st2 = viterbi.create(nbits, 1, K15, 0)
    st2 = viterbi.update_blk(st2, jnp.asarray(soft), K15)
    want = np.asarray(viterbi.streaming_decodebits(st2, delay, K15))
    np.testing.assert_array_equal(got, want)


def test_fused_decision_budget_guard():
    """Oversized fused-decode batches fail loudly instead of OOM-wedging
    the backend (round-1 'B=8 wedge': 2*8*1024*1MB ≈ 16 GB > v5e HBM).
    Small-state codes at B=8 stay under budget and pass the gate."""
    import pytest

    from isee3_decoder_tpu.config import MCQLI24
    from isee3_decoder_tpu.ops.viterbi_pallas_fused import (
        _check_decision_budget,
        decode_frame_fused,
    )

    # B=16 on the single-copy planes path (~17 GB) raises before any
    # kernel launches; the round-1 wedge shape (B=8 flat, 2 copies)
    # still raises on the legacy flat layout
    syms = jnp.full((16, 2048), 128, jnp.uint8)
    with pytest.raises(ValueError, match="chunk the batch"):
        decode_frame_fused(syms, 1024, 0, 0, MCQLI24, interpret=True)
    with pytest.raises(ValueError, match="chunk the batch"):
        _check_decision_budget(8, 1024, MCQLI24.nstates, copies=2)

    # B=8 at K=24 fits on the planes path (one tape, ~8.6 GB) — the
    # fallback chunk size models/decode._viterbi_decode now uses
    _check_decision_budget(8, 1024, MCQLI24.nstates, copies=1)
    # B=4 flat (the old bench configuration) is within budget
    _check_decision_budget(4, 1024, MCQLI24.nstates)
    # small code at B=8: fine (the gate is about memory, not batch)
    _check_decision_budget(8, 1024, 256)


def test_colpar_planes_match_infold():
    """The precomputed kernel-B column planes equal the in-kernel fold
    they replaced (commit 84d6b1b): parity(col_lo & mask) per step for
    both branch planes, plus the pair-position bit."""
    from isee3_decoder_tpu.ops.viterbi_pallas_fused import (
        _colpar_planes,
        _geometry,
        _step_masks,
    )

    for code in (K15, MCQLI24):
        w, rowb, colb = _geometry(code)
        nsteps = w - rowb
        planes = _colpar_planes(code, nsteps)
        assert planes.shape == (3 * nsteps, 1 << colb)
        cols = np.arange(1 << colb, dtype=np.int64)
        for j in range(nsteps):
            t = rowb + j
            _, cl1, _, cl2 = _step_masks(code, t)
            s = w - 1 - t
            col_lo = cols & ~(1 << s)
            par = lambda v: np.bitwise_count(v.astype(np.uint64)) & 1
            np.testing.assert_array_equal(planes[3 * j], par(col_lo & cl1))
            np.testing.assert_array_equal(
                planes[3 * j + 1], par(col_lo & (cl1 ^ cl2))
            )
            np.testing.assert_array_equal(planes[3 * j + 2], (cols >> s) & 1)
