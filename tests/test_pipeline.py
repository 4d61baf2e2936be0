"""End-to-end pipeline tests: synthetic IQ → decoded frames.

The round-trip the reference operators ran on real recordings
(README.txt:9-14), on reproducible synthetic signals instead.
"""

import numpy as np
import jax.numpy as jnp

import pytest

from isee3_decoder_tpu.config import FRAMEBITS, SYNCWORD
from isee3_decoder_tpu.models.decode import (
    DECODER_FANO,
    DecodeConfig,
    decode_stream,
)
from isee3_decoder_tpu.models.pipeline import PipelineConfig, run_pipeline
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal
from isee3_decoder_tpu.utils.sim import simulate
import jax


@pytest.mark.slow
def test_end_to_end_single_channel():
    """One 512 bps channel at high SNR: pmdemod → symdemod → decode
    recovers the transmitted frames bit-exactly via Fano."""
    rng = np.random.default_rng(42)
    frames = testsignal.random_frames(rng, 5)
    iq = testsignal.synthesize_iq(
        frames,
        samprate=250_000.0,
        symrate=1024.0,
        carrier=20_000.0,
        noise_std=800.0,
        lead_symbols=301,
        rng=rng,
    )
    cfg = PipelineConfig(
        pm=PMConfig(samprate=250_000.0, binsize=4.0, search_width=100.0),
        sym=SymConfig(samprate=250_000.0, symrate=1024.0),
        decode=DecodeConfig(),
    )
    res = run_pipeline(iq, cfg)
    assert res.cn0[:, 0].min() > 25  # comfortably above the 21 dB-Hz lock threshold
    good_frames = [r for r in res.frames if r.good[0]]
    assert len(good_frames) >= 2, f"got {len(res.frames)} frames, good={[(r.good[0], r.decoder[0]) for r in res.frames]}"
    decoded = [r.data[0] for r in good_frames]
    # Which transmitted frames were recovered (allow the first to be
    # missed if sync landed mid-stream)
    matched = 0
    for d in decoded:
        for f in frames:
            if np.array_equal(d, f):
                matched += 1
                break
    assert matched == len(decoded) and matched >= 2
    # at this SNR frames decode via a device tier: the quicklook fast
    # path when the frame is error-free, Fano otherwise — never Viterbi
    from isee3_decoder_tpu.models.decode import DECODER_QLEC, DECODER_QUICKLOOK

    assert all(
        int(r.decoder[0]) in (DECODER_FANO, DECODER_QUICKLOOK, DECODER_QLEC)
        for r in good_frames
    )


def test_decode_stream_pure_symbols():
    """decode stage alone on clean simulated soft symbols, two channels
    with different sync offsets."""
    rng = np.random.default_rng(7)
    frames = testsignal.random_frames(rng, 3)
    syms = testsignal.frames_to_symbols(frames)
    soft = np.where(syms > 0, 228, 28).astype(np.uint8)

    offs = [17, 230]
    maxlen = len(soft) + max(offs)
    streams = []
    for o in offs:
        lead = np.full(o, 128, np.uint8)
        tail = np.full(maxlen - o - len(soft), 128, np.uint8)
        streams.append(np.concatenate([lead, soft, tail]))
    stream = np.stack(streams)

    recs, state = decode_stream(stream, DecodeConfig())
    assert len(recs) >= 2
    for ch in range(2):
        goods = [r for r in recs if r.good[ch]]
        assert len(goods) >= 1
        for r in goods:
            assert any(np.array_equal(r.data[ch], f) for f in frames)


def test_decode_stream_noisy_channel_sim():
    """Symbols through the 8-bit AWGN channel at Eb/N0≈5 dB decode via
    Fano with the production metric table."""
    rng = np.random.default_rng(8)
    frames = testsignal.random_frames(rng, 2)
    syms = testsignal.frames_to_symbols(frames)
    # symdemod normalizes amplitude to 100; Eb/N0 5dB → Es/N0 2dB
    sig, noise = 81.65, 45.0
    soft = np.asarray(simulate(jax.random.PRNGKey(1), jnp.asarray(syms), sig, noise))
    recs, _ = decode_stream(soft[None, :], DecodeConfig())
    goods = [r for r in recs if r.good[0]]
    assert len(goods) >= 1
    for r in goods:
        assert any(np.array_equal(r.data[0], f) for f in frames)


@pytest.mark.slow
def test_receive_block_fused_chain():
    """The single-program fused receive chain (IQ -> packed frames in one
    dispatch) recovers the transmitted frames of two channels."""
    from isee3_decoder_tpu.models.pipeline import receive_block

    rng = np.random.default_rng(7)
    frames = testsignal.random_frames(rng, 5)
    iqs = []
    for carrier in (20_000.0, 23_500.0):
        # lead <= 33 keeps the first sync inside the 2048-position search
        # of the fused block's find_sync (decode.c:162-193 window)
        iqs.append(
            testsignal.synthesize_iq(
                frames,
                samprate=250_000.0,
                symrate=1024.0,
                carrier=carrier,
                noise_std=800.0,
                lead_symbols=20,
                rng=rng,
            )
        )
    L = min(len(q) for q in iqs)
    iq = np.stack([q[:L] for q in iqs])
    cfg = PipelineConfig(
        pm=PMConfig(samprate=250_000.0, binsize=4.0, search_width=100.0),
        sym=SymConfig(samprate=250_000.0, symrate=1024.0),
        decode=DecodeConfig(),
    )
    nframes = 2
    rec, ss = receive_block(iq, nframes, cfg)
    assert rec.good.all()
    data = rec.data.reshape(2, nframes, FRAMEBITS // 8)
    for ch in range(2):
        for f in range(nframes):
            assert any(np.array_equal(data[ch, f], fr) for fr in frames), (
                f"channel {ch} frame {f} does not match any transmitted frame"
            )


def test_receive_blocks_pipelined_matches_receive_block():
    """The double-buffered driver yields byte-identical results to the
    serialized receive_block, block for block."""
    from isee3_decoder_tpu.models.pipeline import (
        receive_block,
        receive_blocks_pipelined,
    )

    cfg = PipelineConfig(
        pm=PMConfig(samprate=32768.0, binsize=32.0),
        sym=SymConfig(samprate=32768.0, symrate=512.0, window=0.5),
    )
    rng = np.random.default_rng(9)
    iqs = []
    for i in range(3):
        # 3 frames so a worst-case sync position still leaves a full
        # frame+sync inside the block (decode_block's caller contract)
        frames = testsignal.random_frames(rng, 3)
        iq = testsignal.synthesize_iq(
            frames, samprate=cfg.pm.samprate, symrate=cfg.sym.symrate,
            carrier=5000.0, noise_std=900.0, lead_symbols=30, rng=rng,
        )
        iqs.append(testsignal.iq_to_int16(iq)[None, :])
    # equal lengths so one compiled program serves all blocks
    L = min(x.shape[1] for x in iqs)
    iqs = [x[:, :L] for x in iqs]

    want = [receive_block(x, 1, cfg) for x in iqs]
    got = list(receive_blocks_pipelined(iqs, 1, cfg))
    assert len(got) == len(want)
    for (ra, sa), (rb, sb) in zip(got, want):
        np.testing.assert_array_equal(sa, sb)
        np.testing.assert_array_equal(ra.data, rb.data)
        np.testing.assert_array_equal(ra.good, rb.good)
        np.testing.assert_array_equal(ra.decoder, rb.decoder)
        np.testing.assert_array_equal(ra.start_symbol, rb.start_symbol)


@pytest.mark.slow
def test_receive_block_tier2_device_gather_matches_decode_block():
    """When lanes fail the device tier-1 cap, receive_block's fallback
    tiers gather the failed lanes' frame windows from the DEVICE-resident
    soft stream (receive_block_device_soft) — results must equal
    decode_block run on the host-fetched soft symbols (the np gather
    path), lane for lane, including tier-2 Fano cycles and the Viterbi
    fallback."""
    import dataclasses

    from isee3_decoder_tpu.models.decode import decode_block
    from isee3_decoder_tpu.models.pipeline import demod_to_symbols, receive_block

    cfg = PipelineConfig(
        pm=PMConfig(samprate=32768.0, binsize=32.0),
        sym=SymConfig(samprate=32768.0, symrate=512.0, window=0.5),
        # tier-1 cap of 1 cycle/bit: any lane needing a real threshold
        # walk times out at tier 1 and exercises the fallback path
        decode=DecodeConfig(fano_tier1_maxcycles=1, persistent=True),
    )
    rng = np.random.default_rng(11)
    frames = testsignal.random_frames(rng, 3)
    iqs = []
    for carrier, noise_std in ((5000.0, 900.0), (7000.0, 14000.0)):
        iq = testsignal.synthesize_iq(
            frames, samprate=cfg.pm.samprate, symrate=cfg.sym.symrate,
            carrier=carrier, noise_std=noise_std, lead_symbols=30, rng=rng,
        )
        iqs.append(testsignal.iq_to_int16(iq))
    L = min(len(q) for q in iqs)
    iq = np.stack([q[:L] for q in iqs])

    rec, ss = receive_block(iq, 1, cfg)
    # the noisy channel must actually have left the quicklook tier
    assert (rec.decoder != 3).any()

    soft, _, _, _ = demod_to_symbols(jnp.asarray(iq), cfg)
    want, want_ss = decode_block(np.asarray(soft), 1, cfg.decode)
    np.testing.assert_array_equal(ss, want_ss)
    np.testing.assert_array_equal(rec.data, want.data)
    np.testing.assert_array_equal(rec.good, want.good)
    np.testing.assert_array_equal(rec.decoder, want.decoder)
    np.testing.assert_array_equal(rec.fano_cycles, want.fano_cycles)
