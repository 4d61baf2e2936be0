"""Doppler fast path on real TPU: correctness + perf vs zero-Doppler."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "build", "jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.ops import carrier

samprate = 250_000.0
cfg0 = carrier.PMConfig(samprate=samprate, binsize=4.0, search_width=200.0)
cfgD = carrier.PMConfig(
    samprate=samprate, binsize=4.0, search_width=200.0, doppler_rate=50.0
)
n = cfg0.fftsize
nch, T = 128, 8
rng = np.random.default_rng(5)

# chirping PM carriers, synthesized host-side once
i = np.arange(T * n, dtype=np.float64)
data = rng.integers(0, 2, 4096) * 2 - 1
sym_idx = (i / 244.14).astype(int) % len(data)
half = (i % 244.14) < 122.07
d = np.where(data[sym_idx] > 0, 1.0, -1.0) * np.where(half, -1.0, 1.0)
freqs = 20_000.0 + 137.0 * np.arange(nch)


def make(fc, dr):
    ph = (
        2 * np.pi * fc * i / samprate
        + 2 * np.pi * (dr / samprate**2) * (i * (i + 1) / 2)
        + 1.1 * d
        + 0.3
    )
    z = 12000 * np.exp(1j * ph) + rng.normal(0, 800, i.size) + 1j * rng.normal(0, 800, i.size)
    ri = np.stack([z.real, z.imag], axis=-1).reshape(-1)
    return np.trunc(np.clip(ri, -32767, 32767)).astype(np.int16)


for label, cfg, dr in (("D=0", cfg0, 0.0), ("D=50", cfgD, 50.0)):
    raw = np.stack([make(f, dr) for f in freqs]).reshape(nch, T, 2 * n)
    assert carrier._raw_fast_capable(cfg, nch, n), label
    carry = carrier.init_carry(nch, cfg)
    c1, out = carrier.pm_demod_scan(carry, jnp.asarray(raw), cfg)
    _ = float(out.baseband[0, 0, 0].astype(jnp.float32) + 0.0)  # warm+sync
    locked = np.asarray(out.locked)
    t0 = time.perf_counter()
    c1, out = carrier.pm_demod_scan(carry, jnp.asarray(raw), cfg)
    _ = float(out.cn0.sum())
    dt = time.perf_counter() - t0
    f_last = np.asarray(out.carrier_freq)[-1]
    print(
        f"{label}: t_scan {dt:6.3f}s  locked {locked.sum()}/{locked.size}  "
        f"freq[ch0] last block {f_last[0]:.1f} Hz "
        f"(expect ~{freqs[0] + dr * (T - 1) * n / samprate:.1f})",
        flush=True,
    )
