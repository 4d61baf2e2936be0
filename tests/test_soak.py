"""Long-duration soak of the streaming receive chain (VERDICT r4 #8).

30+ minutes of synthetic 250 ksps signal through ``receive_stream`` in
30-second chunks — the reference's while(1) contract (pmdemod.c:204-230)
at scale: bounded host memory, carrier-carry stability across ~6,900 pm
blocks (no float32 drift), a mid-soak checkpoint/restore that replays
bit-identically, and every post-acquisition frame recovered.
"""

import os
import resource

import numpy as np
import pytest

from isee3_decoder_tpu.models.pipeline import (
    PipelineConfig,
    init_chain_carry,
    receive_stream,
)
from isee3_decoder_tpu.utils import testsignal


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.mark.slow
def test_receive_stream_soak_30min():
    minutes = float(os.environ.get("SOAK_MINUTES", "31"))
    samprate, symrate = 250_000.0, 1024.0
    chunk_s = 30.0
    nframes_uniq = 16
    rng = np.random.default_rng(5)
    frames = testsignal.random_frames(rng, nframes_uniq)

    # one frame period = 2 s; tile the 16 unique frames to cover the soak
    total_frames = int(minutes * 60 * symrate / 2048) + 2
    reps = total_frames // nframes_uniq + 1
    tx = np.tile(frames, (reps, 1))
    iq = testsignal.synthesize_iq(
        tx, samprate=samprate, symrate=symrate, carrier=20_000.0,
        noise_std=1500.0, lead_symbols=60, rng=rng,
    )
    nsamples = int(minutes * 60 * samprate)
    raw = testsignal.iq_to_int16(iq[:nsamples])  # interleaved int16
    del iq

    cfg = PipelineConfig()
    carry = init_chain_carry(1, cfg)
    chunk_vals = int(chunk_s * samprate) * 2
    nchunks = len(raw) // chunk_vals
    assert nchunks >= 60, "soak shorter than intended"

    got = []
    rss = []
    ckpt_chunk = nchunks // 2
    for c in range(nchunks):
        part = raw[c * chunk_vals : (c + 1) * chunk_vals][None, :]
        if c == ckpt_chunk:
            # mid-soak checkpoint: process the chunk, then restore and
            # replay it — byte-identical frames and carry required
            # (SURVEY.md §5.4: the carry IS the checkpoint story)
            import copy

            import jax

            # deep-copy the carry as a checkpoint would serialize it:
            # array leaves copied, the DecodeStreamState host object
            # reconstructed (tree_map would treat it as a single leaf)
            saved = carry._replace(
                pm=jax.tree_util.tree_map(np.asarray, carry.pm),
                iq_rem=carry.iq_rem.copy(),
                bb=carry.bb.copy(),
                first=carry.first.copy(),
                soft=carry.soft.copy(),
                dec=copy.deepcopy(carry.dec),
            )
            recs_a, carry_a = receive_stream(part, cfg, carry)
            recs_b, carry_b = receive_stream(part, cfg, saved)
            assert len(recs_a) == len(recs_b)
            for ra, rb in zip(recs_a, recs_b):
                np.testing.assert_array_equal(ra.data, rb.data)
                np.testing.assert_array_equal(ra.good, rb.good)
                np.testing.assert_array_equal(
                    ra.start_symbol, rb.start_symbol
                )
            for xa, xb in zip(
                jax.tree_util.tree_leaves(carry_a),
                jax.tree_util.tree_leaves(carry_b),
            ):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
            recs, carry = recs_a, carry_a
        else:
            recs, carry = receive_stream(part, cfg, carry)
        got.extend(recs)
        rss.append(_rss_mb())

    # every frame after sync acquisition recovered and payload-correct
    ngood = sum(int(r.good[0]) for r in got)
    assert len(got) >= total_frames - 4
    assert ngood >= len(got) - 2, f"lost lock mid-soak: {ngood}/{len(got)}"
    tx_set = {f.tobytes() for f in frames}
    for r in got[1:]:
        if r.good[0]:
            assert r.data[0].tobytes() in tx_set
    # the LAST frames still decode -> no cumulative carrier/timing drift
    assert got[-1].good[0] and got[-2].good[0]

    # bounded memory: steady-state RSS flat (ru_maxrss is a high-water
    # mark, so flatness == nothing grows after warmup)
    assert rss[-1] <= rss[len(rss) // 3] * 1.2 + 256.0, (
        f"RSS grew through the soak: {rss[len(rss) // 3]:.0f} -> "
        f"{rss[-1]:.0f} MB"
    )
