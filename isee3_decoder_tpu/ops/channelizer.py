"""Polyphase FFT channelizer: one wideband stream → many channels.

The reference processes exactly one downlink per run (its carrier found
inside a single 250 ksps passband).  Scaling to the 100+ channel target
needs a front-end that splits a wideband capture into per-channel
basebands — the classic critically-sampled polyphase filterbank,
which is ideal TPU work: the polyphase filtering is a batched matmul
against the prototype-filter taps (MXU) and the channel transform is a
batched FFT.

Channel k (k = 0..M-1) is centered at frequency k·fs_out (negative
frequencies alias as usual), with output rate fs_in / M.  Outputs feed
straight into the per-channel PM demod (`models/pipeline.py`) via the
batch axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def prototype_lowpass(nchan: int, taps_per_branch: int = 8, beta: float = 9.0) -> np.ndarray:
    """Kaiser-windowed sinc prototype for a critically sampled PFB.

    Cutoff at half the channel spacing; length nchan * taps_per_branch.
    """
    n = nchan * taps_per_branch
    t = np.arange(n) - (n - 1) / 2
    h = np.sinc(t / nchan) * np.kaiser(n, beta)
    return (h / h.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("nchan", "taps_per_branch"))
def channelize(
    x: jax.Array,
    nchan: int,
    taps_per_branch: int = 8,
    taps: jax.Array | None = None,
) -> jax.Array:
    """Split a complex wideband stream into nchan complex basebands.

    Args:
      x: (L,) or (B, L) complex64 wideband samples at rate fs_in.
      nchan: number of channels M (output rate fs_in / M).
      taps: optional prototype filter (len M*taps_per_branch); default
        Kaiser sinc.

    Returns (B?, nchan, L//M - taps_per_branch + 1) complex64: channel k
    centered at +k·fs_in/M (wrap for negative).
    """
    if x.ndim == 1:
        x = x[None, :]
    B, L = x.shape
    P = taps_per_branch
    nframes = L // nchan
    x = x[:, : nframes * nchan].reshape(B, nframes, nchan)

    if taps is None:
        h = jnp.asarray(prototype_lowpass(nchan, P))
    else:
        h = jnp.asarray(taps, jnp.float32)
    # polyphase branches: h reshaped (P, M); branch r filters x[:, :, r]
    hb = h.reshape(P, nchan)

    # windowed frames: y[m] = sum_p x[m+p] * hb[p]  (per branch), as P
    # static shifted slices — a gather of (B, nout, P, M) would copy the
    # capture P-fold through HBM before the reduce
    nout = nframes - P + 1
    filtered = jnp.zeros((B, nout, nchan), x.dtype)
    for p in range(P):
        filtered = filtered + x[:, p : p + nout, :] * hb[p][None, None, :]

    # Channel transform: a tone at +k*fs_out gives branch r the constant
    # phase e^{+j2πkr/M}, so the forward DFT across branches collects it
    # into bin k.  Critically sampled → no per-frame phase correction
    # (e^{-j2πk(mM)/M} = 1).
    spect = jnp.fft.fft(filtered, axis=-1)  # (B, nout, M)
    return jnp.swapaxes(spect, 1, 2).astype(jnp.complex64)  # (B, M, nout)


def channel_center(k: int, fs_in: float, nchan: int) -> float:
    """Center frequency of channel k in Hz (aliased to ±fs_in/2)."""
    f = k * fs_in / nchan
    if f > fs_in / 2:
        f -= fs_in
    return f
