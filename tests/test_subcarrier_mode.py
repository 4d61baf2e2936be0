"""Low-speed subcarrier mode: N clocks of the 1024 Hz subcarrier per
symbol (CHANGES:35-41 — operationally used at 32 sps/16 bps)."""

import numpy as np
import jax.numpy as jnp

from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal


def test_subcarrier_demod_end_to_end():
    """32 clocks/symbol at 32 sps (the 16 bps mode, scaled to a smaller
    sample rate for test speed): pmdemod + symdemod recover the symbol
    stream through the subcarrier integrate-and-dump."""
    samprate = 32768.0
    symrate = 32.0
    clocks = 32  # 1024 Hz subcarrier
    rng = np.random.default_rng(0)
    nsym = 160
    syms = rng.integers(0, 2, nsym).astype(np.uint8)

    ssamp = samprate / symrate
    wave = testsignal.manchester_waveform(syms, ssamp, symbolclocks=clocks)
    t = np.arange(len(wave))
    carrier = 4096.0
    # Modest mod index + lock windowing: the 1024 Hz subcarrier puts
    # discrete sidebands at carrier±1024 that rival the residual carrier
    # at high mod index — the reference handles this operationally with
    # -W lock windowing (CHANGES:45).
    iq = 9000 * np.exp(1j * (2 * np.pi * carrier * t / samprate + 0.7 * wave + 0.4))
    iq = iq + rng.normal(0, 300, len(wave)) + 1j * rng.normal(0, 300, len(wave))

    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=8.0, search_width=100.0),
        sym=SymConfig(samprate=samprate, symrate=symrate, symbolclocks=clocks),
    )
    soft, bb, freq, cn0 = demod_to_symbols(jnp.asarray(iq), cfg)
    assert abs(float(np.asarray(freq)[-1, 0]) - carrier) < 2.0
    hard = (np.asarray(soft)[0] > 128).astype(np.uint8)
    # align within ±1 symbol
    best = 0.0
    for off in range(0, 3):
        L = min(len(hard), nsym - off)
        best = max(best, (hard[:L] == syms[off : off + L]).mean())
    assert best > 0.95, best
