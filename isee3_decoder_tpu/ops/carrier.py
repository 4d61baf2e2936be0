"""PM carrier acquisition / tracking / spin-down kernels.

Capability parity with the ``pmdemod`` stage (pmdemod.c:204-372): per
FFT-sized block — optional Doppler chirp de-rotation, FFT carrier search
(full passband when unlocked, windowed around the last lock when locked),
Quinn's second-estimator sub-bin interpolation, two-pass spin-down with
C/N0 estimation, and emission of the Q (data) axis as int16.

TPU-native design: one batched, jittable function processes a whole
``(channels, fftsize)`` block; the carrier loop state (search center,
C/N0) is an explicit carry pytree, and a ``lax.scan`` strings blocks
together (models/pmdemod.py).  The reference's iterative complex
oscillators (pmdemod.c:239-243, 330-335) become analytic phase ramps —
numerically cleaner and fully parallel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.ops.reductions import argmax_last


@dataclasses.dataclass(frozen=True)
class PMConfig:
    """Static pmdemod configuration (pmdemod.c:75-131 defaults)."""

    samprate: float = 250_000.0
    binsize: float = 4.0  # FFT bin size request, Hz
    search_width: float = 0.0  # ±Hz when locked; 0 disables windowing
    doppler_rate: float = 0.0  # Hz/s chirp
    cn0_threshold: float = 21.0  # dB-Hz lock threshold
    dtype: jnp.dtype = jnp.float32  # float64 for C-matching golden runs

    @property
    def fftsize(self) -> int:
        # Fftsize = 2^round(log2(samprate/binsize)) (pmdemod.c:129-131)
        return 1 << int(np.rint(np.log2(self.samprate / self.binsize)))

    @property
    def actual_binsize(self) -> float:
        return self.samprate / self.fftsize

    @property
    def cdtype(self) -> jnp.dtype:
        return jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64


class PMCarry(NamedTuple):
    """Streaming carry: the reference's cross-block globals
    (Carrier_search_freq, cn0 — pmdemod.c:37,63)."""

    search_center: jax.Array  # (B,) Hz — recentered on lock
    cn0: jax.Array  # (B,) dB-Hz


class PMBlockOut(NamedTuple):
    baseband: jax.Array  # (B, fftsize) int16 — Q axis (data)
    carrier_freq: jax.Array  # (B,) Hz
    cn0: jax.Array  # (B,) dB-Hz
    locked: jax.Array  # (B,) bool


def init_carry(batch: int, cfg: PMConfig, start_freq: float = 0.0) -> PMCarry:
    return PMCarry(
        search_center=jnp.full((batch,), start_freq, cfg.dtype),
        cn0=jnp.full((batch,), -999.0, cfg.dtype),
    )


def _tau(x: jax.Array) -> jax.Array:
    """Quinn's second estimator helper (pmdemod.c:43-46)."""
    return 0.25 * jnp.log(3 * x * x + 6 * x + 1) - np.sqrt(6.0) / 24 * jnp.log(
        (x + 1 - np.sqrt(2 / 3.0)) / (x + 1 + np.sqrt(2 / 3.0))
    )


def doppler_chirp(iq: jax.Array, cfg: PMConfig) -> jax.Array:
    """De-rotate the per-block Doppler chirp (pmdemod.c:232-244).

    The reference restarts its doubly-integrated LO at every block, with
    instantaneous phase drate·i(i+1)/2 at sample i; this applies the same
    ramp analytically.
    """
    if cfg.doppler_rate == 0.0:
        return iq
    n = iq.shape[-1]
    drate = cfg.doppler_rate * 2 * np.pi / (cfg.samprate**2)
    i = jnp.arange(n, dtype=cfg.dtype)
    phase = drate * (i * (i + 1) / 2)
    return iq * jnp.exp(-1j * phase).astype(iq.dtype)


def _search_window(
    center: jax.Array, cn0: jax.Array, cfg: PMConfig
) -> tuple[jax.Array, jax.Array]:
    """(firstbin, lastbin) per channel (pmdemod.c:255-284).

    Faithfully replicates the reference's index arithmetic, including the
    complement-window quirk when the range straddles 0 Hz (after the
    negative-bin wraparound and swap, the searched interval is the
    midband between the two edges).
    """
    n = cfg.fftsize
    binsize = cfg.actual_binsize
    fs = cfg.samprate
    w = cfg.search_width

    locked = (w != 0) & (cn0 > cfg.cn0_threshold)

    lo = center - w
    hi = center + w
    # C int conversion truncates toward zero
    first = jnp.where(
        lo <= -fs / 2,
        jnp.zeros(center.shape, jnp.int32),
        jnp.trunc(lo / binsize).astype(jnp.int32),
    )
    first = jnp.where(first < 0, first + n, first)
    last = jnp.where(
        hi >= fs / 2,
        jnp.full(center.shape, n // 2 - 1, jnp.int32),
        jnp.trunc(hi / binsize).astype(jnp.int32),
    )
    last = jnp.where(last < 0, last + n, last)
    swap = first > last
    first, last = jnp.where(swap, last, first), jnp.where(swap, first, last)

    first = jnp.where(locked, first, 0)
    last = jnp.where(locked, last, n)
    return first, last


def find_carrier(
    spectrum: jax.Array, carry: PMCarry, cfg: PMConfig
) -> tuple[jax.Array, jax.Array]:
    """Peak-energy carrier search + Quinn interpolation
    (pmdemod.c:246-318) → (carrier_freq_hz, peak_bin)."""
    B, n = spectrum.shape
    energy = (spectrum.real**2 + spectrum.imag**2).astype(cfg.dtype)

    first, last = _search_window(carry.search_center, carry.cn0, cfg)
    idx = jnp.arange(n, dtype=jnp.int32)
    # exclusive upper bound, exactly like the reference's scan
    # `for(i=firstbin; i<lastbin; i++)` with lastbin clipped to
    # Fftsize/2 - 1 (pmdemod.c:266-292) — including its quirk that the
    # top window bin is never searched.  (A search_width below binsize/2
    # makes the window empty; the reference asserts on that config.)
    mask = (idx[None, :] >= first[:, None]) & (idx[None, :] < last[:, None])
    masked = jnp.where(mask, energy, -1.0)
    # ">=" update in the reference keeps the *last* maximal bin
    peak = argmax_last(masked, axis=1)
    maxenergy = jnp.take_along_axis(energy, peak[:, None], axis=1)[:, 0]

    nxt = (peak + 1) % n
    prv = (peak - 1 + n) % n
    sp = jnp.take_along_axis(spectrum, peak[:, None], axis=1)[:, 0]
    sn = jnp.take_along_axis(spectrum, nxt[:, None], axis=1)[:, 0]
    sm = jnp.take_along_axis(spectrum, prv[:, None], axis=1)[:, 0]

    safe = jnp.where(maxenergy > 0, maxenergy, 1.0)
    ap = (sn.real * sp.real + sn.imag * sp.imag) / safe
    dp = -ap / (1 - ap)
    am = (sm.real * sp.real + sm.imag * sp.imag) / safe
    dm = am / (1 - am)
    d = (dp + dm) / 2 + _tau(dp * dp) - _tau(dm * dm)
    d = jnp.where(maxenergy > 0, d, 0.0)

    freq = cfg.actual_binsize * (peak.astype(cfg.dtype) + d)
    freq = jnp.where(freq > cfg.samprate / 2, freq - cfg.samprate, freq)
    return freq, peak


def spin_down(
    iq: jax.Array, carrier_freq: jax.Array, cfg: PMConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Two-pass spin-down + C/N0 estimate (pmdemod.c:321-351).

    Returns (baseband complex with carrier on I axis, carrier_amplitude,
    cn0_db).
    """
    B, n = iq.shape
    # LO phase ramp with two-level range reduction: a raw float32
    # cstep*i reaches ~2e5 rad at the end of a 65536-sample block, where
    # the ulp is ~0.016 rad of per-sample phase jitter (the reference's
    # double oscillator has none).  Splitting i = 256*ihi + ilo and
    # reducing the per-256-sample phase modulo one cycle keeps every
    # intermediate below ~384 cycles (~3e-5-cycle ulp).
    i = jnp.arange(n, dtype=jnp.int32)
    ihi = (i // 256).astype(cfg.dtype)
    ilo = (i % 256).astype(cfg.dtype)
    c = (carrier_freq / cfg.samprate).astype(cfg.dtype)  # cycles/sample
    c256 = jnp.mod(c * 256.0, 1.0)
    # no outer mod: exp is periodic, and cyc stays below ~384 cycles
    # where the float32 ulp is ~3e-5 cycles
    cyc = c256[:, None] * ihi[None, :] + c[:, None] * ilo[None, :]
    lo = jnp.exp((-2j * np.pi) * cyc).astype(cfg.cdtype)
    spun = iq * lo

    dc = spun.mean(axis=1)
    amp = jnp.abs(dc)
    unit = jnp.where(amp > 0, jnp.conj(dc) / jnp.where(amp > 0, amp, 1.0), 1.0)
    rotated = spun * unit[:, None]

    var = ((rotated.real - amp[:, None]) ** 2).mean(axis=1)
    cn0 = 10 * jnp.log10(cfg.samprate * amp * amp / (2 * var))
    return rotated, amp, cn0


@functools.partial(jax.jit, static_argnames=("cfg",))
def pm_demod_block(
    carry: PMCarry, iq: jax.Array, cfg: PMConfig = PMConfig()
) -> tuple[PMCarry, PMBlockOut]:
    """One full pmdemod block step: (carry, (B, fftsize) complex IQ) →
    (carry', int16 baseband + status) — the body of pmdemod.c:204-372."""
    iq = iq.astype(cfg.cdtype)
    iq = doppler_chirp(iq, cfg)
    spectrum = jnp.fft.fft(iq, axis=-1)
    freq, _ = find_carrier(spectrum, carry, cfg)
    rotated, amp, cn0 = spin_down(iq, freq, cfg)

    locked = cn0 > cfg.cn0_threshold
    new_center = jnp.where(locked, freq.astype(cfg.dtype), carry.search_center)

    # Q axis, -3 dB headroom, C truncation toward zero (pmdemod.c:360-367)
    scaled = rotated.imag * np.sqrt(0.5)
    baseband = jnp.trunc(scaled).astype(jnp.int16)

    out = PMBlockOut(
        baseband=baseband,
        carrier_freq=freq.astype(cfg.dtype),
        cn0=cn0.astype(cfg.dtype),
        locked=locked,
    )
    return PMCarry(search_center=new_center, cn0=cn0.astype(cfg.dtype)), out


@functools.partial(jax.jit, static_argnames=("cfg",))
def pm_demod_scan(
    carry: PMCarry, iq_blocks: jax.Array, cfg: PMConfig = PMConfig()
) -> tuple[PMCarry, PMBlockOut]:
    """Scan pm_demod_block over the time axis: (B, T, fftsize) → outputs
    stacked over T.  This is the streaming outer loop of pmdemod.c:204."""

    def step(c, blk):
        c, out = pm_demod_block(c, blk, cfg)
        return c, out

    return jax.lax.scan(step, carry, jnp.swapaxes(iq_blocks, 0, 1))


def iq_from_interleaved(raw: jax.Array, flip: bool = False) -> jax.Array:
    """int16 interleaved I,Q → complex (pmdemod.c:206-230; -f flips I/Q)."""
    raw = raw.reshape(*raw.shape[:-1], -1, 2).astype(jnp.float32)
    i, q = raw[..., 0], raw[..., 1]
    if flip:
        i, q = q, i
    return i + 1j * q
