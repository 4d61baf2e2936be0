"""Full receive chain: pmdemod → symdemod → decode.

The reference composes its stages as a UNIX pipeline of byte streams
(README.txt:9).  Here the stages compose as typed array functions over a
``(channels, time)`` batch: a jitted device path produces soft symbols
from raw IQ, and the frame decoder walks them with the hybrid
Fano/Viterbi policy.  Channel parallelism comes from the leading batch
axis (shard it with parallel/sharding.py); time parallelism from the
block/window scans.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.models.decode import (
    DecodeConfig,
    FrameRecord,
    decode_stream,
)
from isee3_decoder_tpu.models.symdemod import (
    initial_firstsample,
    symdemod_scan,
    window_samples,
)
from isee3_decoder_tpu.ops.carrier import PMConfig, init_carry, pm_demod_scan
from isee3_decoder_tpu.ops.symbols import SymConfig


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    pm: PMConfig = PMConfig()
    sym: SymConfig = SymConfig()
    decode: DecodeConfig = DecodeConfig()


class PipelineResult(NamedTuple):
    frames: list[FrameRecord]
    soft_symbols: np.ndarray  # (B, S)
    baseband: np.ndarray  # (B, L) int16
    carrier_freq: np.ndarray  # (T, B)
    cn0: np.ndarray  # (T, B)


def demod_to_symbols(
    iq: jax.Array, cfg: PipelineConfig
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Jitted device path: (B, L) complex IQ → (B, S) soft symbols.

    Carves the stream into FFT blocks for pmdemod and 1-second windows
    for symdemod; trailing partial blocks are dropped exactly as the
    reference's fread loops do (pmdemod.c:210-215, symdemod.c:124-125).
    """
    if iq.ndim == 1:
        iq = iq[None, :]
    B, L = iq.shape
    n = cfg.pm.fftsize
    nblocks = L // n
    blocks = iq[:, : nblocks * n].reshape(B, nblocks, n)

    carry = init_carry(B, cfg.pm)
    carry, pm_out = pm_demod_scan(carry, blocks, cfg.pm)
    baseband = jnp.swapaxes(pm_out.baseband, 0, 1).reshape(B, nblocks * n)

    wlen = window_samples(cfg.sym)
    # one window of slack for the ± timing search and drift
    nwindows = max((nblocks * n - initial_firstsample(cfg.sym)) // wlen - 1, 0)
    _, sym_out = symdemod_scan(baseband, cfg.sym, nwindows)
    soft = jnp.swapaxes(sym_out.soft, 0, 1).reshape(B, -1)
    return soft, baseband, pm_out.carrier_freq, pm_out.cn0


def run_wideband(
    iq_wide: np.ndarray,
    samprate: float,
    nchan: int,
    channels: list[int] | None = None,
    cfg: PipelineConfig | None = None,
    taps_per_branch: int = 8,
) -> PipelineResult:
    """Wideband capture → channelize → per-channel receive chain.

    Args:
      iq_wide: (L,) complex wideband samples at ``samprate``.
      nchan: polyphase channel count (per-channel rate samprate/nchan).
      channels: channel indices to demodulate (default: all).
      cfg: pipeline config for the *channel* rate; defaults to the
        standard 512 bps config at samprate/nchan.
    """
    import jax.numpy as jnp

    from isee3_decoder_tpu.ops.channelizer import channelize

    fs_out = samprate / nchan
    if cfg is None:
        cfg = PipelineConfig(
            pm=PMConfig(samprate=fs_out, binsize=4.0, search_width=200.0),
            sym=SymConfig(samprate=fs_out),
        )
    y = channelize(jnp.asarray(iq_wide), nchan, taps_per_branch)[0]
    if channels is not None:
        y = y[jnp.asarray(channels)]
    return run_pipeline(np.asarray(y), cfg)


def run_pipeline(iq: np.ndarray, cfg: PipelineConfig = PipelineConfig()) -> PipelineResult:
    """End-to-end: IQ in, decoded frames out (the full
    ``pmdemod | symdemod | decode`` chain)."""
    soft, baseband, freq, cn0 = demod_to_symbols(jnp.asarray(iq), cfg)
    soft_np = np.asarray(soft)
    frames, _ = decode_stream(soft_np, cfg.decode)
    return PipelineResult(
        frames=frames,
        soft_symbols=soft_np,
        baseband=np.asarray(baseband),
        carrier_freq=np.asarray(freq),
        cn0=np.asarray(cn0),
    )
