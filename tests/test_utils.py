"""Tests for metric tables, channel simulator, time formatting."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.utils import (
    channel_cdf,
    decoder_amplitudes,
    ebn0_to_noise,
    format_hms,
    gen_met,
    simulate,
)


def reference_gen_met(signal, noise, bias, scale):
    """Direct Python port of metrics.c:24-89 as a test oracle."""
    def normal(x):
        return 0.5 + 0.5 * math.erf(x / math.sqrt(2.0))

    mettab = np.zeros((2, 256), dtype=np.int64)
    left0 = left1 = 0.0
    inv_noise = 1.0 / noise
    for s in range(256):
        right0 = normal((s - 128 + 0.5 + signal) * inv_noise) if s != 255 else 1.0
        right1 = normal((s - 128 + 0.5 - signal) * inv_noise) if s != 255 else 1.0
        p0 = right0 - left0
        p1 = right1 - left1
        left0, left1 = right0, right1
        if p0 == p1:
            m0 = m1 = -bias
        else:
            m0 = -33.0 if p0 == 0 else 1 + math.log2(p0) - math.log2(p0 + p1) - bias
            m1 = -33.0 if p1 == 0 else 1 + math.log2(p1) - math.log2(p0 + p1) - bias
        # lrint rounds half to even
        mettab[0][s] = round(m0 * scale)
        mettab[1][s] = round(m1 * scale)
    return mettab


def test_gen_met_matches_reference():
    for signal, noise, bias, scale in [
        (81.65, 57.74, 0.5, 8.0),   # decode.c:128-135 defaults (Eb/N0=3dB)
        (30.0, 26.79, 0.5, 8.0),    # fanotest defaults at Eb/N0=2dB
        (100.0, 20.0, 0.0, 4.0),    # Viterbi-style bias 0
    ]:
        want = reference_gen_met(signal, noise, bias, scale)
        got = gen_met(signal, noise, bias, scale)
        np.testing.assert_array_equal(got, want)


def test_decoder_amplitudes():
    sig, noise = decoder_amplitudes(100.0, 1.0)
    # decode.c:128-131: noise = 100/sqrt(3), signal = noise*sqrt(2)
    assert abs(noise - 100 / math.sqrt(3)) < 1e-12
    assert abs(sig - noise * math.sqrt(2)) < 1e-12


def test_channel_cdf_monotone():
    cdf = channel_cdf(30.0, 25.0)
    assert cdf.shape == (2, 256)
    assert (np.diff(cdf, axis=1) >= 0).all()
    assert np.allclose(cdf[:, 255], 1.0, atol=1e-12)


def test_simulate_distribution():
    """Sampled symbol histogram matches the channel pmf (sim.c pattern)."""
    signal, noise = 30.0, ebn0_to_noise(30.0, 3.0)
    key = jax.random.PRNGKey(0)
    n = 200_000
    tx = jnp.zeros(n, dtype=jnp.uint8)
    rx = np.asarray(simulate(key, tx, signal, noise))
    assert rx.dtype == np.uint8
    # Mean should be near 128 - signal, std near noise
    assert abs(rx.mean() - (128 - signal)) < 0.5
    assert abs(rx.std() - noise) < 0.5
    tx1 = jnp.ones(n, dtype=jnp.uint8)
    rx1 = np.asarray(simulate(jax.random.PRNGKey(1), tx1, signal, noise))
    assert abs(rx1.mean() - (128 + signal)) < 0.5


def test_simulate_reproducible():
    key = jax.random.PRNGKey(42)
    tx = jnp.zeros(1000, dtype=jnp.uint8)
    a = simulate(key, tx, 30.0, 25.0)
    b = simulate(key, tx, 30.0, 25.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_format_hms():
    assert format_hms(0.0) == "00:00.000"
    assert format_hms(61.5) == "01:01.500"
    assert format_hms(3661.25) == "01:01:01.250"
    assert format_hms(90061.0) == "1:01:01:01.000"
