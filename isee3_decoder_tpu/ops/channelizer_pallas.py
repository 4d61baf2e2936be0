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
    interleave as (exact) MXU work instead of a lane shuffle (Mosaic
    rejects stack+reshape, narrowing bitcasts, and strided stores).

    The kernel applies them in 128-column blocks (the interleave is
    block-diagonal), so the matmul stays O(T·128²) instead of O(T²·M):
    the full (T, 2T) expander dominated the kernel at T=512 (71 ms vs
    46.6 ms blocked for the bench capture — the blocked form sits on
    the runtime's measured passthrough floor)."""
    E = np.zeros((T, 2 * T), np.float32)
    O = np.zeros((T, 2 * T), np.float32)
    E[np.arange(T), 2 * np.arange(T)] = 1.0
    O[np.arange(T), 2 * np.arange(T) + 1] = 1.0
    return E, O


def _expanders4(T: int) -> tuple[np.ndarray, ...]:
    """0/1 matrices scattering column j to columns 4j+i — the 4-way
    even-I/even-Q/odd-I/odd-Q interleave of the 2x-oversampled bank."""
    mats = []
    for i in range(4):
        Ei = np.zeros((T, 4 * T), np.float32)
        Ei[np.arange(T), 4 * np.arange(T) + i] = 1.0
        mats.append(Ei)
    return tuple(mats)


@functools.partial(
    jax.jit,
    static_argnames=("nchan", "taps_per_branch", "tile", "oversample", "interpret"),
)
def channelize_raw_fused(
    wide_packed: jax.Array,
    nchan: int,
    taps_per_branch: int = 8,
    taps: jax.Array | None = None,
    tile: int = 512,
    oversample: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """One packed-int32 wideband capture → (nchan, 2·nout) int16 raw.

    Args:
      wide_packed: (nchan*L,) int32 packed IQ samples at rate
        nchan·samprate (I = low 16 bits, Q = high 16, sign-extended).
      nchan: channel count M; must be a multiple of 128 (lane width).
      taps: optional prototype filter, len M·taps_per_branch (default
        the Kaiser sinc of ops/channelizer.prototype_lowpass with the
        SAME cutoff convention as the jnp path per oversample mode).
      tile: output frames per kernel step.
      oversample: 1 = critically sampled; 2 = the 2x-oversampled bank
        (hop M/2 — odd output samples come from frames offset by M/2,
        their odd bins sign-flipped; ops/channelizer.py:112-129): a
        carrier at a channel EDGE stays unaliased and decodable.  The
        odd stream's frames are built in-VMEM from a lane roll + a
        row-shifted select (no extra HBM reads).

    Returns (nchan, 2·oversample·nout) int16 interleaved I,Q per
    channel (output rate oversample·fs_in/M), where
    nout = ((L - taps_per_branch - oversample + 1) // tile) · tile — a
    few samples shorter than the jnp path's; the receive chain drops
    trailing partial FFT blocks either way (pmdemod.c:210-215).
    """
    if nchan % 128 != 0:
        raise ValueError(f"fused channelizer needs nchan % 128 == 0, got {nchan}")
    if oversample not in (1, 2):
        raise ValueError("oversample must be 1 or 2")
    M, P, T = nchan, taps_per_branch, tile
    halo = P + oversample - 1  # os=2's odd frames read one row further
    L = wide_packed.shape[0] // M
    ntiles = (L - halo) // T
    if ntiles < 1:
        raise ValueError(f"capture too short: {L} frames < {T + halo}")
    if T % 128 != 0:
        raise ValueError(f"tile must be a multiple of 128, got {T}")
    if taps is None:
        h = prototype_lowpass(M, P, cutoff_scale=1.2 if oversample == 2 else 1.0)
    else:
        h = np.asarray(taps, np.float32)
    hb = jnp.asarray(h.reshape(P, M))
    C, S = _dft_mats(M)
    x2d = wide_packed[: L * M].reshape(L, M)

    def taps_stage(If, Qf, hb_ref):
        ar = jnp.zeros((T, M), jnp.float32)
        ai = jnp.zeros((T, M), jnp.float32)
        for p in range(P):
            ar = ar + If[p : p + T, :] * hb_ref[p, :]
            ai = ai + Qf[p : p + T, :] * hb_ref[p, :]
        return ar, ai

    def dft_stage(ar, ai, c_ref, s_ref):
        re = _dot(ar, c_ref[:]) + _dot(ai, s_ref[:])
        im = _dot(ai, c_ref[:]) - _dot(ar, s_ref[:])
        re_t = jnp.trunc(jnp.clip(re, -32767.0, 32767.0)).T
        im_t = jnp.trunc(jnp.clip(im, -32767.0, 32767.0)).T
        return re_t, im_t  # (M, T) each

    common_specs = [
        pl.BlockSpec((P, M), lambda i: (0, 0)),
        pl.BlockSpec((M, M), lambda i: (0, 0)),
        pl.BlockSpec((M, M), lambda i: (0, 0)),
    ]
    params = (
        None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    )

    if oversample == 1:
        E, O = _expanders(128)

        def kern(x_ref, hb_ref, c_ref, s_ref, e_ref, o_ref, out_ref):
            xw = x_ref[:]
            If = ((xw << 16) >> 16).astype(jnp.float32)  # sign-extended I
            Qf = (xw >> 16).astype(jnp.float32)
            re_t, im_t = dft_stage(*taps_stage(If, Qf, hb_ref), c_ref, s_ref)
            for c in range(T // 128):
                blk = _dot(re_t[:, c * 128 : (c + 1) * 128], e_ref[:]) + _dot(
                    im_t[:, c * 128 : (c + 1) * 128], o_ref[:]
                )
                out_ref[:, 2 * c * 128 : (2 * c + 2) * 128] = blk.astype(
                    jnp.int16
                )

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
                *common_specs,
                pl.BlockSpec((128, 256), lambda i: (0, 0)),
                pl.BlockSpec((128, 256), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((M, 2 * T), lambda i: (0, i)),
            compiler_params=params,
            interpret=interpret,
        )(x2d, hb, jnp.asarray(C), jnp.asarray(S), jnp.asarray(E), jnp.asarray(O))

    # ---- 2x oversampled: even stream (hop M) + odd stream (offset M/2,
    # odd bins sign-flipped), outputs 4-way interleaved Ie,Qe,Io,Qo ----
    E4 = _expanders4(128)

    def kern2(x_ref, hb_ref, c_ref, s_ref, e0_ref, e1_ref, e2_ref, e3_ref, out_ref):
        xw = x_ref[:]  # (T+P+1, M)
        If = ((xw << 16) >> 16).astype(jnp.float32)
        Qf = (xw >> 16).astype(jnp.float32)
        # odd-stream frames: frame t = samples t·M + M/2 .. t·M + 3M/2,
        # i.e. a half-lane roll whose wrapped half comes from row t+1
        lane = jax.lax.broadcasted_iota(jnp.int32, (T + P, M), 1)
        rI = pltpu.roll(If, M // 2, 1)
        rQ = pltpu.roll(Qf, M // 2, 1)
        If_o = jnp.where(lane < M // 2, rI[: T + P], rI[1 : T + P + 1])
        Qf_o = jnp.where(lane < M // 2, rQ[: T + P], rQ[1 : T + P + 1])
        ar_e, ai_e = taps_stage(If, Qf, hb_ref)
        ar_o, ai_o = taps_stage(If_o, Qf_o, hb_ref)
        re_e = _dot(ar_e, c_ref[:]) + _dot(ai_e, s_ref[:])
        im_e = _dot(ai_e, c_ref[:]) - _dot(ar_e, s_ref[:])
        # odd frames' odd bins flip sign ((-1)^{km} phase residue)
        bins = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
        sg = (1.0 - 2.0 * (bins % 2)).astype(jnp.float32)
        re_o = (_dot(ar_o, c_ref[:]) + _dot(ai_o, s_ref[:])) * sg
        im_o = (_dot(ai_o, c_ref[:]) - _dot(ar_o, s_ref[:])) * sg
        planes = [
            jnp.trunc(jnp.clip(v, -32767.0, 32767.0)).T
            for v in (re_e, im_e, re_o, im_o)
        ]
        exps = (e0_ref, e1_ref, e2_ref, e3_ref)
        for c in range(T // 128):
            blk = sum(
                _dot(pln[:, c * 128 : (c + 1) * 128], e_ref[:])
                for pln, e_ref in zip(planes, exps)
            )
            out_ref[:, 4 * c * 128 : (4 * c + 4) * 128] = blk.astype(
                jnp.int16
            )

    return pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((M, 4 * ntiles * T), jnp.int16),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(T + P + 1), pl.Element(M)), lambda i: (i * T, 0)
            ),
            *common_specs,
            pl.BlockSpec((128, 512), lambda i: (0, 0)),
            pl.BlockSpec((128, 512), lambda i: (0, 0)),
            pl.BlockSpec((128, 512), lambda i: (0, 0)),
            pl.BlockSpec((128, 512), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, 4 * T), lambda i: (0, i)),
        compiler_params=params,
        interpret=interpret,
    )(x2d, hb, jnp.asarray(C), jnp.asarray(S), *(jnp.asarray(e) for e in E4))
