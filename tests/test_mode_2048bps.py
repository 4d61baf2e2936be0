"""The 4096 sps / 2048 bps operational mode (CHANGES:40 — half-second
frames), end-to-end through the pipeline."""

import numpy as np
import pytest

from isee3_decoder_tpu.models.decode import DecodeConfig
from isee3_decoder_tpu.models.pipeline import PipelineConfig, run_pipeline
from isee3_decoder_tpu.ops.carrier import PMConfig
from isee3_decoder_tpu.ops.symbols import SymConfig
from isee3_decoder_tpu.utils import testsignal


@pytest.mark.slow
def test_end_to_end_2048bps():
    rng = np.random.default_rng(1)
    frames = testsignal.random_frames(rng, 6)  # 0.5 s frames
    iq = testsignal.synthesize_iq(
        frames,
        samprate=250_000.0,
        symrate=4096.0,
        carrier=30_000.0,
        noise_std=900.0,
        lead_symbols=20,  # keep the first sync inside the initial search window
        rng=rng,
    )
    cfg = PipelineConfig(
        pm=PMConfig(samprate=250_000.0, binsize=4.0, search_width=200.0),
        sym=SymConfig(samprate=250_000.0, symrate=4096.0, window=0.5),
        decode=DecodeConfig(),
    )
    res = run_pipeline(iq, cfg)
    goods = [r for r in res.frames if r.good[0]]
    assert len(goods) >= 2, [
        (bool(r.good[0]), int(r.decoder[0])) for r in res.frames
    ]
    matched = sum(
        1 for r in goods if any(np.array_equal(r.data[0], f) for f in frames)
    )
    assert matched == len(goods)
