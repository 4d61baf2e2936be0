"""VERDICT r1 #7: the 16 bps subcarrier mode decoded END TO END, and a
seeded multi-point Eb/N0 frame-error-rate regression for the hybrid
decoder pair.

The 32 sps/16 bps mode (64 s frames, 32 clocks of the 1024 Hz subcarrier
per symbol) is one of the three operationally decoded modes
(CHANGES:37-41, symdemod.c:74-77).  The FER sweep pins the coding
performance the reference harnesses only printed for eyeballs
(fanotest.c:99-100; Fano threshold ≈ 2.5 dB per CHANGES:21).
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.config import FRAMEBITS, MCQLI24, SYNC_STATE, SYNCWORD
from isee3_decoder_tpu.models.decode import (
    DECODER_FANO,
    DECODER_QUICKLOOK,
    DecodeConfig,
    decode_stream,
)
from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
from isee3_decoder_tpu.ops import encode_bits
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import ebn0_to_noise, gen_met, simulate, testsignal


@pytest.mark.slow
def test_16bps_subcarrier_full_frame_decode():
    """A full 1024-bit minor frame through the complete chain in the
    16 bps mode: PM demod → 32-clock subcarrier integrate-and-dump →
    sync → frame decode, payload byte-exact."""
    samprate = 8192.0
    symrate = 32.0
    clocks = 32
    rng = np.random.default_rng(42)
    # 3 frames: frame 0 precedes the first usable sync, and the symdemod
    # window slack truncates the tail — frames 1..2 must stay complete
    frames = testsignal.random_frames(rng, 3)

    iq = testsignal.synthesize_iq(
        frames,
        samprate=samprate,
        symrate=symrate,
        carrier=1700.0,
        mod_index=0.7,
        amplitude=9000.0,
        noise_std=350.0,
        symbolclocks=clocks,
        # keep the first complete sync (lead + 2048 - 34) inside the
        # 2048-position search range of decode.c:166
        lead_symbols=20,
        rng=rng,
    )
    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=8.0, search_width=100.0),
        sym=SymConfig(samprate=samprate, symrate=symrate, symbolclocks=clocks),
    )
    soft, _, freq, _ = demod_to_symbols(jnp.asarray(iq), cfg)
    assert abs(float(np.asarray(freq)[-1, 0]) - 1700.0) < 2.0

    recs, _ = decode_stream(np.asarray(soft), cfg.decode)
    good = [r for r in recs if r.good[0]]
    assert good, "no frame decoded in 16 bps mode"
    payloads = {bytes(r.data[0]) for r in good}
    assert bytes(frames[1]) in payloads  # frame 0 precedes first sync
    from isee3_decoder_tpu.models.decode import DECODER_QLEC

    for r in good:
        assert int(r.decoder[0]) in (DECODER_FANO, DECODER_QUICKLOOK, DECODER_QLEC)


@pytest.mark.slow
def test_fer_sweep_fano_viterbi():
    """Seeded 3-point Eb/N0 sweep of full 1024-bit MCQLI-24 frames:
    Fano deletion rate falls with SNR, finished frames are error-free
    (no undetected errors), and the Viterbi fallback decodes frames the
    Fano walk deleted near threshold — the hybridtest.c pattern with
    asserted outcomes."""
    signal = 100.0
    trials = 16
    nbits = FRAMEBITS
    rng = np.random.default_rng(31)
    tail = SYNCWORD & ((1 << (MCQLI24.k - 1)) - 1)

    bits = np.zeros((trials, nbits), np.uint8)
    bits[:, : nbits - 64] = rng.integers(0, 2, (trials, nbits - 64))
    for j in range(MCQLI24.k - 1):
        bits[:, nbits - 1 - j] = (tail >> j) & 1
    syms, _ = encode_bits(jnp.asarray(bits), SYNC_STATE, MCQLI24)

    deletion = {}
    failed_rx = None
    failed_idx = None
    for i, ebn0 in enumerate((2.5, 3.0, 4.0)):
        noise = ebn0_to_noise(signal, ebn0)
        mettab = jnp.asarray(gen_met(signal, noise, 0.5, 8.0))
        rx = simulate(jax.random.PRNGKey(100 + i), syms, signal, noise)
        res = fano_decode(
            rx, mettab, nbits, SYNC_STATE, tail, MCQLI24, FanoParams(32, 100)
        )
        finished = np.asarray(res.goodbits) == nbits
        errs = (np.asarray(res.bits) != bits).any(axis=1)
        assert (finished & errs).sum() == 0, f"undetected errors at {ebn0} dB"
        deletion[ebn0] = 1.0 - finished.mean()
        if ebn0 == 3.0 and (~finished).any():
            failed_rx = np.asarray(rx)[~finished]
            failed_idx = np.nonzero(~finished)[0]

    # monotone-ish: the workable threshold is ≈2.5 dB (CHANGES:21)
    assert deletion[4.0] <= deletion[3.0] <= deletion[2.5] + 1e-9, deletion
    assert deletion[4.0] <= 2 / trials, deletion
    assert deletion[2.5] < 1.0, "every frame deleted at 2.5 dB"

    # hybrid policy: Viterbi decodes what Fano deleted (decode.c:209-231)
    if failed_rx is not None:
        from isee3_decoder_tpu.ops import viterbi as vit

        sub = failed_rx[:2]
        got = np.asarray(
            vit.decode_frame(
                jnp.asarray(sub), nbits, SYNC_STATE, SYNC_STATE, MCQLI24
            )
        )
        np.testing.assert_array_equal(got, bits[failed_idx[:2]])
