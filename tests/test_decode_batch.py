"""Frame-batched throughput decode mode."""

import numpy as np
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.models.decode import (
    DECODER_FANO,
    DecodeConfig,
    decode_frames_batch,
)
from isee3_decoder_tpu.ops.syncword import find_sync
from isee3_decoder_tpu.utils import testsignal
from isee3_decoder_tpu.utils.sim import simulate


def test_decode_frames_batch_multichannel():
    rng = np.random.default_rng(0)
    nframes = 3
    frames = testsignal.random_frames(rng, nframes + 1)
    syms = testsignal.frames_to_symbols(frames)
    sig, noise = 81.65, 40.0
    B = 3
    streams = []
    offs = [5, 20, 33]  # keep off+2014 within the 2048-position search
    key = jax.random.PRNGKey(0)
    for b in range(B):
        key, sub = jax.random.split(key)
        soft = np.asarray(simulate(sub, jnp.asarray(syms), sig, noise))
        streams.append(np.concatenate([np.full(offs[b], 128, np.uint8), soft]))
    maxlen = max(len(s) for s in streams)
    stream = np.stack([np.pad(s, (0, maxlen - len(s)), constant_values=128) for s in streams])

    # acquire sync: first full sync is at off + 2048-34 (end of frame 1)
    ss, _ = find_sync(jnp.asarray(stream[:, :4096]), 2048)
    ss = np.asarray(ss, np.int64)
    want_ss = np.array(offs) + 2048 - 34
    np.testing.assert_array_equal(ss, want_ss)

    rec = decode_frames_batch(stream, ss, nframes, DecodeConfig())
    assert rec.good.all()
    data = rec.data.reshape(B, nframes, 128)
    for b in range(B):
        for f in range(nframes):
            # frame 0 of the batch is tx frame 1 (frame 0 precedes sync)
            np.testing.assert_array_equal(data[b, f], frames[f + 1])
    assert (rec.decoder == DECODER_FANO).all()
