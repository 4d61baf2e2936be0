"""Fused polyphase channelizer: packed IQ capture → per-channel raw
int16 streams in ONE Pallas kernel.

The jnp path (ops/channelizer.channelize + the complex→int16 conversion
in models/pipeline.receive_wideband_device_soft) re-streams the ~2 GB
capture several times through HBM: 8 shifted tap reads, the batched FFT,
the (nout, M)→(M, nout) transpose, and the complex64 intermediate's
round trip into int16 raw — measured as a 2x gap between the wideband
regime and the per-channel-IQ headline (0.207 vs 0.106 s/block,
BENCH round 5).  This kernel reads the PACKED int32 capture once and
writes the per-channel interleaved int16 raw streams once:

  * input rows are sample frames: row n holds samples n·M..n·M+M-1 of
    the capture as packed int32 (I low half, Q high half — byte-
    identical to the interleaved int16 recording, pmdemod.c:206-230);
  * the P tap-weighted shifted adds run on a (T+P, M) VMEM tile with
    elementwise-offset (halo) block reads (pl.Element);
  * the channel transform is the DFT as an MXU matmul against the
    (M, M) cos/sin matrices — fft over 128 branches IS a 128x128
    matmul, the MXU-native form (Precision.HIGHEST: the default f32
    matmul truncates to bf16 and corrupts the int16 quantization,
    measured max-error 96 LSB vs 1 LSB at HIGHEST);
  * the (T, M)→(M, T) transpose and the I/Q interleave to (M, 2T)
    happen in-registers: the interleave is two matmuls against 0/1
    expander matrices (single-term products — exact in f32);
  * int16 quantization (trunc∘clip) matches the jnp path bit-for-bit
    up to f32-rounding trunc-boundary flips (≤1 LSB on ~0.04% of
    samples, equivalence test).

Output feeds models/pipeline.demod_to_symbols's raw int16 ingestion
directly (the TPU-hardened fused pm path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isee3_decoder_tpu.ops.channelizer import prototype_lowpass

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _dft_mats(nchan: int) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin of the forward DFT (jnp.fft.fft convention e^{-j2πrk/M}:
    X = x @ (C - jS))."""
    rk = np.outer(np.arange(nchan), np.arange(nchan))
    ang = 2.0 * np.pi * rk / nchan
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _expanders(T: int) -> tuple[np.ndarray, np.ndarray]:
    """0/1 matrices scattering column j to columns 2j / 2j+1 — the I/Q
    interleave as (exact) MXU work instead of a lane shuffle."""
    E = np.zeros((T, 2 * T), np.float32)
    O = np.zeros((T, 2 * T), np.float32)
    E[np.arange(T), 2 * np.arange(T)] = 1.0
    O[np.arange(T), 2 * np.arange(T) + 1] = 1.0
    return E, O


@functools.partial(
    jax.jit, static_argnames=("nchan", "taps_per_branch", "tile", "interpret")
)
def channelize_raw_fused(
    wide_packed: jax.Array,
    nchan: int,
    taps_per_branch: int = 8,
    taps: jax.Array | None = None,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """One packed-int32 wideband capture → (nchan, 2·nout) int16 raw.

    Args:
      wide_packed: (nchan*L,) int32 packed IQ samples at rate
        nchan·samprate (I = low 16 bits, Q = high 16, sign-extended).
      nchan: channel count M; must be a multiple of 128 (lane width).
      taps: optional prototype filter, len M·taps_per_branch (default
        the Kaiser sinc of ops/channelizer.prototype_lowpass — the SAME
        filter as the jnp path, critically sampled).
      tile: output frames per kernel step.

    Returns (nchan, 2·nout) int16 interleaved I,Q per channel, where
    nout = ((L - taps_per_branch) // tile) · tile — a few samples
    shorter than the jnp path's L-P+1; the receive chain drops trailing
    partial FFT blocks either way (pmdemod.c:210-215).
    """
    if nchan % 128 != 0:
        raise ValueError(f"fused channelizer needs nchan % 128 == 0, got {nchan}")
    M, P, T = nchan, taps_per_branch, tile
    L = wide_packed.shape[0] // M
    ntiles = (L - P) // T
    if ntiles < 1:
        raise ValueError(f"capture too short: {L} frames < {T + P}")
    if taps is None:
        h = prototype_lowpass(M, P)
    else:
        h = np.asarray(taps, np.float32)
    hb = jnp.asarray(h.reshape(P, M))
    C, S = _dft_mats(M)
    E, O = _expanders(T)
    x2d = wide_packed[: L * M].reshape(L, M)

    def kern(x_ref, hb_ref, c_ref, s_ref, e_ref, o_ref, out_ref):
        xw = x_ref[:]
        If = ((xw << 16) >> 16).astype(jnp.float32)  # sign-extended I
        Qf = (xw >> 16).astype(jnp.float32)
        ar = jnp.zeros((T, M), jnp.float32)
        ai = jnp.zeros((T, M), jnp.float32)
        for p in range(P):
            ar = ar + If[p : p + T, :] * hb_ref[p, :]
            ai = ai + Qf[p : p + T, :] * hb_ref[p, :]
        re = _dot(ar, c_ref[:]) + _dot(ai, s_ref[:])
        im = _dot(ai, c_ref[:]) - _dot(ar, s_ref[:])
        re_i = jnp.trunc(jnp.clip(re, -32767.0, 32767.0))
        im_i = jnp.trunc(jnp.clip(im, -32767.0, 32767.0))
        out = _dot(re_i.T, e_ref[:]) + _dot(im_i.T, o_ref[:])
        out_ref[:] = out.astype(jnp.int16)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, 2 * ntiles * T), jnp.int16),
        grid=(ntiles,),
        in_specs=[
            # elementwise-offset block: tile i reads frames
            # [i·T, i·T + T + P) — the P-1 halo rows overlap tile i+1
            pl.BlockSpec(
                (pl.Element(T + P), pl.Element(M)), lambda i: (i * T, 0)
            ),
            pl.BlockSpec((P, M), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((M, M), lambda i: (0, 0)),
            pl.BlockSpec((T, 2 * T), lambda i: (0, 0)),
            pl.BlockSpec((T, 2 * T), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, 2 * T), lambda i: (0, i)),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2d, hb, jnp.asarray(C), jnp.asarray(S), jnp.asarray(E), jnp.asarray(O))
