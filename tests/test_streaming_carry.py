"""Cross-call streaming carry through the receive chain (VERDICT r1 #4).

The reference decodes an unbounded stream with state implicit in process
memory (pmdemod.c:204, symdemod.c:96, decode.c:149 while(1) loops).  The
library-level equivalent is models/pipeline.receive_stream with an
explicit ChainCarry: chunked calls must produce byte-identical frames to
one call on the concatenated recording — no re-acquisition transient.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax.numpy as jnp

from isee3_decoder_tpu.models.pipeline import (
    PipelineConfig,
    demod_to_symbols,
    init_chain_carry,
    receive_stream,
)
from isee3_decoder_tpu.models.decode import decode_stream
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal

CFG = PipelineConfig(
    pm=PMConfig(samprate=32768.0, binsize=32.0),  # fftsize 1024
    sym=SymConfig(samprate=32768.0, symrate=512.0, window=0.5),
)


def _recording(nframes: int, seed: int = 3):
    rng = np.random.default_rng(seed)
    frames = testsignal.random_frames(rng, nframes)
    iq = testsignal.synthesize_iq(
        frames,
        samprate=CFG.pm.samprate,
        symrate=CFG.sym.symrate,
        carrier=5000.0,
        noise_std=600.0,
        lead_symbols=50,
        rng=rng,
    )
    return testsignal.iq_to_int16(iq), frames


def _flatten(records):
    return [
        (
            int(r.start_symbol[b]),
            bool(r.good[b]),
            int(r.decoder[b]),
            bytes(r.data[b]),
        )
        for r in records
        for b in range(r.data.shape[0])
    ]


@pytest.mark.slow
def test_chunked_stream_equals_one_call():
    raw, frames = _recording(5)
    # one-shot reference: full demod + fresh decode walk
    soft1, _, _, _ = demod_to_symbols(jnp.asarray(raw[None, :]), CFG)
    recs1, _ = decode_stream(np.asarray(soft1), CFG.decode)
    flat1 = _flatten(recs1)
    assert len(flat1) >= 3
    assert sum(1 for f in flat1 if f[1]) >= 2  # good frames decoded

    # streaming: ragged chunks, including one smaller than an FFT block
    cuts = [0, 1536, 1536 + 2 * 32768, 1536 + 2 * 32768 + 99000, len(raw)]
    carry = init_chain_carry(1, CFG)
    flat2 = []
    softs = []
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        recs, carry = receive_stream(raw[None, lo:hi], CFG, carry)
        flat2.extend(_flatten(recs))
        # collect every soft symbol the stream emitted for the byte diff
    assert flat2 == flat1


def test_stream_soft_symbols_bit_exact():
    """The demod path alone: chunked soft symbols == one-shot bytes."""
    raw, _ = _recording(3, seed=4)
    soft1, _, _, _ = demod_to_symbols(jnp.asarray(raw[None, :]), CFG)
    soft1 = np.asarray(soft1)

    carry = init_chain_carry(1, CFG)
    for lo in range(0, len(raw), 81920):
        # trim=False keeps every emitted soft symbol in the carry buffer
        _, carry = receive_stream(raw[None, lo : lo + 81920], CFG, carry,
                                  trim=False)
    got = carry.soft
    assert carry.soft_base == 0
    n = min(got.shape[1], soft1.shape[1])
    assert n >= soft1.shape[1] - CFG.sym.nsymbols  # at most one pending window
    np.testing.assert_array_equal(got[:, :n], soft1[:, :n])


def test_carry_is_a_checkpointable_pytree():
    """ChainCarry round-trips through the checkpoint utility (SURVEY §5.4)."""
    import jax

    from isee3_decoder_tpu.utils import checkpoint

    raw, _ = _recording(2, seed=5)
    carry = init_chain_carry(1, CFG)
    _, carry = receive_stream(raw[None, : len(raw) // 2], CFG, carry)

    leaves, treedef = jax.tree_util.tree_flatten(
        (carry.pm, carry.first, carry.soft, carry.bb)
    )
    assert all(hasattr(l, "shape") for l in leaves)

    # resume from a straight copy (the serialized form) and finish
    recs_a, _ = receive_stream(raw[None, len(raw) // 2 :], CFG, carry)
    carry_b = ChainCarryCopy(carry)
    recs_b, _ = receive_stream(raw[None, len(raw) // 2 :], CFG, carry_b)
    assert _flatten(recs_a) == _flatten(recs_b)


def ChainCarryCopy(c):
    import copy

    from isee3_decoder_tpu.models.decode import DecodeStreamState
    from isee3_decoder_tpu.models.pipeline import ChainCarry

    dec = DecodeStreamState(c.dec.batch)
    dec.lock = c.dec.lock.copy()
    dec.pos = c.dec.pos.copy()
    dec.sync_start = c.dec.sync_start.copy()
    return ChainCarry(
        pm=c.pm,
        iq_rem=c.iq_rem.copy(),
        bb=c.bb.copy(),
        bb_base=c.bb_base,
        bb_total=c.bb_total,
        first=c.first.copy(),
        windows_done=c.windows_done,
        soft=c.soft.copy(),
        soft_base=c.soft_base,
        dec=dec,
    )
