"""Fused Pallas channelizer (ops/channelizer_pallas.py) equivalence.

The kernel must reproduce the jnp PFB+FFT path (ops/channelizer.py) plus
the complex→int16 raw conversion of the wideband chain entry
(models/pipeline.receive_wideband_device_soft) — same taps, same DFT
convention, same trunc∘clip quantization — up to f32-rounding flips at
trunc boundaries (the DFT runs as an MXU matmul instead of the FFT).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from isee3_decoder_tpu.ops.channelizer import channelize
from isee3_decoder_tpu.ops.channelizer_pallas import channelize_raw_fused

M, P = 128, 8


def _random_capture(rng, nframes):
    i = rng.integers(-20000, 20000, (nframes, M)).astype(np.int32)
    q = rng.integers(-20000, 20000, (nframes, M)).astype(np.int32)
    packed = ((i & 0xFFFF) | (q << 16)).reshape(-1)
    wide_c = (i.astype(np.float32) + 1j * q.astype(np.float32)).reshape(-1)
    return packed, wide_c.astype(np.complex64)


def _jnp_raw(wide_c):
    """The wideband chain's jnp front-end: channelize + int16 raw."""
    chans = channelize(jnp.asarray(wide_c), M, P)[0]  # (M, nout)
    ri = jnp.stack([chans.real, chans.imag], axis=-1).reshape(M, -1)
    return np.asarray(
        jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)
    )


def test_fused_channelizer_matches_jnp_path():
    rng = np.random.default_rng(42)
    T = 128
    nframes = 3 * T + P + 5  # exercise the trailing-frame trim
    packed, wide_c = _random_capture(rng, nframes)

    raw = np.asarray(
        channelize_raw_fused(
            jnp.asarray(packed), M, P, tile=T, interpret=True
        )
    )
    ref = _jnp_raw(wide_c)

    nout_k = raw.shape[1] // 2
    assert nout_k == 3 * T  # (nframes - P) // T tiles
    a = raw[:, : 2 * nout_k].astype(np.int32)
    b = ref[:, : 2 * nout_k].astype(np.int32)
    d = np.abs(a - b)
    # identical up to f32 trunc-boundary flips (DFT-as-matmul vs FFT)
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_fused_channelizer_recovers_a_tone():
    """A pure carrier in channel k must land in output row k with the
    expected baseband rotation (channelize's fft bin convention)."""
    rng = np.random.default_rng(1)
    T = 128
    nframes = 2 * T + P
    n = np.arange(nframes * M)
    k = 37
    tone = 8000.0 * np.exp(2j * np.pi * k * n / M)
    i = np.round(tone.real).astype(np.int32)
    q = np.round(tone.imag).astype(np.int32)
    packed = (i & 0xFFFF) | (q << 16)
    raw = np.asarray(
        channelize_raw_fused(jnp.asarray(packed), M, P, tile=T, interpret=True)
    )
    iq = raw.astype(np.float32).reshape(M, -1, 2)
    power = (iq[..., 0] ** 2 + iq[..., 1] ** 2).mean(axis=1)
    assert power.argmax() == k
    # critically-sampled bank: everything else ≥ 40 dB down
    others = np.delete(power, k)
    assert others.max() < power[k] * 1e-4


def _jnp_raw_os2(wide_c):
    chans = channelize(jnp.asarray(wide_c), M, P, oversample=2)[0]
    ri = jnp.stack([chans.real, chans.imag], axis=-1).reshape(M, -1)
    return np.asarray(
        jnp.trunc(jnp.clip(ri, -32767.0, 32767.0)).astype(jnp.int16)
    )


def test_fused_channelizer_oversample2_matches_jnp():
    """The 2x-oversampled kernel (odd stream via lane roll + row-shift
    select, odd bins sign-flipped) reproduces channelize(oversample=2)
    plus int16 conversion."""
    rng = np.random.default_rng(7)
    T = 128
    nframes = 2 * T + P + 4
    packed, wide_c = _random_capture(rng, nframes)
    raw = np.asarray(
        channelize_raw_fused(
            jnp.asarray(packed), M, P, tile=T, oversample=2, interpret=True
        )
    )
    ref = _jnp_raw_os2(wide_c)
    n = min(raw.shape[1], ref.shape[1])
    d = np.abs(raw[:, :n].astype(np.int32) - ref[:, :n].astype(np.int32))
    assert d.max() <= 1
    assert (d > 0).mean() < 0.01


def test_fused_channelizer_oversample2_edge_tone():
    """A tone halfway between channels k and k+1 — lost to aliasing in
    the critically sampled bank — survives in the 2x bank (both
    neighbours see it cleanly at ±fs_out/4)."""
    T = 128
    nframes = 2 * T + P
    n = np.arange(nframes * M)
    k = 21
    f = (k + 0.5) / M  # channel-edge frequency
    tone = 9000.0 * np.exp(2j * np.pi * f * n)
    i = np.round(tone.real).astype(np.int32)
    q = np.round(tone.imag).astype(np.int32)
    packed = (i & 0xFFFF) | (q << 16)
    raw = np.asarray(
        channelize_raw_fused(
            jnp.asarray(packed), M, P, tile=T, oversample=2, interpret=True
        )
    )
    iq = raw.astype(np.float64).reshape(M, -1, 2)
    z = iq[..., 0] + 1j * iq[..., 1]
    # both neighbours carry the tone; its per-channel baseband frequency
    # is ±half the channel spacing = ±fs_out/4 (fs_out = 2·fs_in/M)
    power = (np.abs(z) ** 2).mean(axis=1)
    assert set(np.argsort(power)[-2:]) == {k, k + 1}
    zk = z[k][P:]  # skip filter warm-up
    rot = zk[1:] * np.conj(zk[:-1])
    freq = np.angle(rot.mean()) / (2 * np.pi)  # cycles/output-sample
    assert abs(freq - 0.25) < 0.01


def test_fused_channelizer_rejects_unaligned_nchan():
    with pytest.raises(ValueError, match="128"):
        channelize_raw_fused(jnp.zeros(64 * 100, jnp.int32), 64, P)


def test_fused_frontend_feeds_demod_like_jnp():
    """The kernel's raw output drives the per-channel demod to
    near-identical soft symbols as the jnp front-end (the downstream
    contract of receive_wideband_device_soft's fused branch)."""
    from isee3_decoder_tpu.models.pipeline import (
        PipelineConfig,
        demod_to_symbols,
    )
    from isee3_decoder_tpu.ops.carrier import PMConfig
    from isee3_decoder_tpu.ops.symbols import SymConfig

    cfg = PipelineConfig(
        pm=PMConfig(samprate=8192.0, binsize=8.0, search_width=400.0),
        sym=SymConfig(samprate=8192.0, symrate=64.0, window=0.25),
    )
    rng = np.random.default_rng(3)
    Lc = 7 * 1024  # per-channel samples: enough for ≥2 symdemod windows
    packed, wide_c = _random_capture(rng, Lc)

    raw_f = channelize_raw_fused(
        jnp.asarray(packed), M, P, tile=256, interpret=True
    )
    raw_j = jnp.asarray(_jnp_raw(wide_c)[:, : raw_f.shape[1]])
    soft_f, _, _, _ = demod_to_symbols(raw_f, cfg)
    soft_j, _, _, _ = demod_to_symbols(raw_j, cfg)
    a = np.asarray(soft_f, np.int32)
    b = np.asarray(soft_j, np.int32)
    assert a.shape == b.shape and a.size > 0
    # ±1 LSB front-end differences perturb the demod gain marginally
    assert np.abs(a - b).max() <= 3
    assert (a != b).mean() < 0.02
