"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isee3_decoder_tpu.config import CodeSpec
from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
from isee3_decoder_tpu.ops import encode_bits, viterbi
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.parallel import (
    decode_frame_sharded,
    demod_to_symbols_sharded,
    make_mesh,
)
from isee3_decoder_tpu.utils import testsignal

K9F = CodeSpec("TESTK9F", 0o713, 0o715, 9, 0, 1)


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_state_sharded_viterbi_matches_single_device():
    """State-dim sharded ACS (4-way shuffle exchange) must be bit-exact
    vs the single-device kernel."""
    _require_devices(8)
    mesh = make_mesh(n_channels_axis=2, n_state_axis=4)
    rng = np.random.default_rng(0)
    B, nbits = 2, 80
    bits = rng.integers(0, 2, (B, nbits), dtype=np.uint8)
    bits[:, -(K9F.k - 1):] = 0
    syms, _ = encode_bits(jnp.asarray(bits), 0, K9F)
    noisy = np.clip(
        np.where(np.asarray(syms) > 0, 168, 88).astype(np.int32)
        + rng.integers(-60, 60, syms.shape),
        0,
        255,
    ).astype(np.uint8)

    want = np.asarray(viterbi.decode_frame(jnp.asarray(noisy), nbits, 0, 0, K9F))
    got = np.asarray(
        decode_frame_sharded(jnp.asarray(noisy), mesh, nbits, 0, 0, K9F)
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, bits)


def test_channel_sharded_demod_matches_single_device():
    _require_devices(8)
    mesh = make_mesh(n_channels_axis=8, n_state_axis=1)
    rng = np.random.default_rng(1)
    cfg = PipelineConfig(
        pm=PMConfig(samprate=32768.0, binsize=8.0),
        sym=SymConfig(samprate=32768.0, symrate=128.0, window=0.5),
    )
    frames = testsignal.random_frames(rng, 1)
    chans = []
    for c in range(8):
        iq = testsignal.synthesize_iq(
            frames,
            samprate=32768.0,
            symrate=128.0,
            carrier=2000.0 + 130.0 * c,
            noise_std=500.0,
            rng=np.random.default_rng(100 + c),
        )
        chans.append(iq[: 3 * cfg.pm.fftsize])
    iq = np.stack(chans)

    soft_s, bb_s, f_s, c_s = demod_to_symbols_sharded(iq, cfg, mesh)
    soft_1, bb_1, f_1, c_1 = demod_to_symbols(jnp.asarray(iq), cfg)
    np.testing.assert_array_equal(np.asarray(soft_s), np.asarray(soft_1))
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_1), rtol=1e-5)


def test_mesh_shapes():
    _require_devices(8)
    mesh = make_mesh(n_channels_axis=4, n_state_axis=2)
    assert mesh.shape["ch"] == 4
    assert mesh.shape["state"] == 2


@pytest.mark.slow
def test_channel_sharded_receive_block_matches_single_device():
    """The fused IQ→frames program sharded over the ch axis returns the
    same packed result buffer as the single-device run (the multi-chip
    form of the full receive chain)."""
    _require_devices(8)
    from isee3_decoder_tpu.models.decode import unpack_block_buffer
    from isee3_decoder_tpu.models.pipeline import receive_block_device
    from isee3_decoder_tpu.parallel import receive_block_sharded

    mesh = make_mesh(n_channels_axis=8, n_state_axis=1)
    rng = np.random.default_rng(5)
    # 4 tx frames: demod's window slack drops ~2 s, and the first frame
    # is consumed by sync acquisition — leaving one decodable frame
    frames = testsignal.random_frames(rng, 4)
    chans = []
    for c in range(8):
        iq = testsignal.synthesize_iq(
            frames,
            samprate=250_000.0,
            symrate=1024.0,
            carrier=20_000.0 + 140.0 * c,
            noise_std=800.0,
            lead_symbols=20,
            rng=np.random.default_rng(200 + c),
        )
        chans.append(iq)
    L = min(len(q) for q in chans)
    iq = np.stack([q[:L] for q in chans])
    cfg = PipelineConfig(
        pm=PMConfig(samprate=250_000.0, binsize=4.0, search_width=100.0),
        sym=SymConfig(samprate=250_000.0, symrate=1024.0),
    )
    nframes = 1

    buf_s = np.asarray(receive_block_sharded(iq, nframes, cfg, mesh))
    buf_1 = np.asarray(receive_block_device(jnp.asarray(iq), nframes, 2048, cfg))
    np.testing.assert_array_equal(buf_s, buf_1)

    data, good, decoder, ok, cycles, ss = unpack_block_buffer(buf_s, 8, nframes)
    assert good.all()
    for ch in range(8):
        assert any(np.array_equal(data[ch], fr) for fr in frames)
