"""On-device telemetry signal synthesis.

The host↔device data path can be orders of magnitude slower than the
chip (especially through tunneled/virtualized runtimes), so benchmarks
and large-scale tests synthesize IQ *on the device*: only the frame
bytes (a few KB) are uploaded, and the encode → Manchester → PM chain
runs as jitted jnp ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.config import DEFAULT_CODE, SYNC_STATE, CodeSpec
from isee3_decoder_tpu.ops.encode import bytes_to_bits, encode_bits


@functools.partial(
    jax.jit,
    static_argnames=(
        "nsamples", "samprate", "symrate", "mod_index", "amplitude",
        "noise_std", "code",
    ),
)
def synthesize_iq_device(
    frames: jax.Array,
    carrier_hz: jax.Array,
    key: jax.Array,
    nsamples: int,
    samprate: float = 250_000.0,
    symrate: float = 1024.0,
    mod_index: float = 1.1,
    amplitude: float = 12_000.0,
    noise_std: float = 0.0,
    code: CodeSpec = DEFAULT_CODE,
) -> jax.Array:
    """(B, nframes, 128) frame bytes → (B, nsamples) complex64 IQ.

    carrier_hz: (B,) per-channel carrier frequencies.
    The symbol stream repeats cyclically to fill nsamples.
    """
    B = frames.shape[0]
    data = frames.reshape(B, -1)
    bits = bytes_to_bits(data)
    syms, _ = encode_bits(bits, SYNC_STATE, code)  # (B, 2*nbits)
    nsym = syms.shape[-1]

    ssamp = samprate / symrate
    t = jnp.arange(nsamples, dtype=jnp.float32)
    pos = t / jnp.float32(ssamp)
    sym_idx = jnp.floor(pos).astype(jnp.int32) % nsym
    frac = pos - jnp.floor(pos)
    second_half = frac >= 0.5
    level = jnp.where(
        jnp.take_along_axis(
            syms, jnp.broadcast_to(sym_idx[None, :], (B, nsamples)), axis=-1
        ) > 0,
        1.0,
        -1.0,
    ).astype(jnp.float32)
    d = jnp.where(second_half[None, :], level, -level)

    ph = (
        2 * jnp.pi * carrier_hz[:, None] * t[None, :] / samprate
        + mod_index * d
        + 0.7
    )
    iq = amplitude * jnp.exp(1j * ph)
    if noise_std > 0:
        kr, ki = jax.random.split(key)
        iq = iq + noise_std * (
            jax.random.normal(kr, iq.shape, jnp.float32)
            + 1j * jax.random.normal(ki, iq.shape, jnp.float32)
        )
    return iq.astype(jnp.complex64)
