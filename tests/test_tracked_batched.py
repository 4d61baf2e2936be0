"""Device-batched clock tracking (models/symdemod_tracked.py).

Validation pattern: (1) batching invariance — channels tracked together
must match each channel tracked alone (per-channel accept masks may not
couple lanes); (2) functional clock recovery — an off-nominal spacecraft
clock is pulled in and the symbols decode, where the untracked
demodulator loses the stream; (3) agreement with the host per-channel
tracker (models/symdemod.symdemod_tracked), which remains the golden
B=1 path (byte-exact vs compiled `symdemod -t`).
"""

import numpy as np
import pytest

from isee3_decoder_tpu.models.symdemod import symdemod_tracked
from isee3_decoder_tpu.models.symdemod_tracked import symdemod_tracked_batched
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal


def _baseband(rng, true_symrate, samprate=250_000.0, nframes=3, amp=2000.0,
              noise=150.0):
    syms = np.asarray(
        testsignal.frames_to_symbols(testsignal.random_frames(rng, nframes))
    )
    wav = testsignal.manchester_waveform(syms, samprate / true_symrate)
    return (amp * wav + rng.normal(0, noise, len(wav))).astype(np.int16)


def test_batched_tracker_batching_invariance():
    """Tracking 3 channels together == tracking each alone."""
    rng = np.random.default_rng(11)
    chans = [
        _baseband(np.random.default_rng(100 + b), 1024.0 + 0.15 * b)
        for b in range(3)
    ]
    L = min(len(c) for c in chans)
    bb = np.stack([c[:L] for c in chans])
    cfg = SymConfig(samprate=250_000.0, symrate=1024.0)
    nw = 3
    soft_all, infos_all = symdemod_tracked_batched(bb, cfg, nw)
    for b in range(3):
        soft_1, infos_1 = symdemod_tracked_batched(bb[b : b + 1], cfg, nw)
        n = soft_1.shape[1]
        np.testing.assert_array_equal(soft_all[b, :n], soft_1[0], f"ch {b}")
        for wa, w1 in zip(infos_all, infos_1):
            assert wa["symbolsamples"][b] == w1["symbolsamples"][0]
            assert wa["firstsample"][b] == w1["firstsample"][0]


def test_batched_tracker_recovers_offset_clock():
    """A 0.4 Hz clock offset (the ACTUALCLOCK-scale error the -t mode
    exists for) is tracked: the estimated symrate converges toward the
    true clock and the demodulated symbols stay coherent through the
    last window (untracked, the timing error is ~0.4 sym by stream end)."""
    rng = np.random.default_rng(5)
    true_symrate = 1024.4
    bb = _baseband(rng, true_symrate, nframes=4)[None, :]
    cfg = SymConfig(samprate=250_000.0, symrate=1024.0)
    nw = 5
    soft, infos = symdemod_tracked_batched(bb, cfg, nw)
    est = float(np.atleast_1d(infos[-1]["symrate"])[0])
    assert abs(est - true_symrate) < 0.1, f"clock not tracked: {est}"
    # symbols in the LAST window remain confidently demodulated
    last = soft[0, -1000:]
    frac_confident = (np.abs(last.astype(np.int32) - 128) > 40).mean()
    assert frac_confident > 0.9


def test_batched_matches_host_tracker():
    """Same signal through the host per-channel tracker and the batched
    grid tracker: clock estimates agree to within one grid step and the
    demodulated soft streams agree almost everywhere (the batched
    tracker quantizes the climb step; see module docstring)."""
    rng = np.random.default_rng(9)
    bb = _baseband(rng, 1024.25, nframes=3)[None, :]
    cfg = SymConfig(samprate=250_000.0, symrate=1024.0)
    nw = 3
    soft_b, infos_b = symdemod_tracked_batched(bb, cfg, nw)
    soft_h, infos_h = symdemod_tracked(bb, cfg, nw)
    ss_b = float(np.atleast_1d(infos_b[-1]["symbolsamples"])[0])
    ss_h = float(np.atleast_1d(infos_h[-1]["symbolsamples"])[0])
    incr0 = 0.5 * cfg.symbolsamples / (cfg.window * cfg.samprate)
    assert abs(ss_b - ss_h) < 4 * incr0, (ss_b, ss_h)
    n = min(soft_b.shape[1], soft_h.shape[1])
    agree = (soft_b[0, :n] == soft_h[0, :n]).mean()
    assert agree > 0.98, f"soft agreement {agree}"
