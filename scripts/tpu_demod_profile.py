"""Profile pmdemod vs symdemod on TPU at bench.py shapes."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from isee3_decoder_tpu.models.decode import DecodeConfig
    from isee3_decoder_tpu.models.pipeline import PipelineConfig
    from isee3_decoder_tpu.models.symdemod import (
        initial_firstsample,
        symdemod_scan,
        window_samples,
    )
    from isee3_decoder_tpu.ops.carrier import PMConfig, init_carry, pm_demod_scan
    from isee3_decoder_tpu.ops.symbols import SymConfig
    from isee3_decoder_tpu.utils import testsignal
    from isee3_decoder_tpu.utils.devicesignal import synthesize_iq_device

    samprate, symrate = 250_000.0, 1024.0
    nchan, nframes = int(os.environ.get("PROF_NCHAN", "32")), 4
    seconds = (nframes * 2048 + 400) / symrate
    nsamples = int(seconds * samprate)

    rng = np.random.default_rng(0)
    frames = testsignal.random_frames(rng, nframes)
    frames_dev = jnp.asarray(np.broadcast_to(frames, (nchan, *frames.shape)))
    carriers = jnp.asarray(20_000.0 + 137.0 * np.arange(nchan), jnp.float32)

    cfg = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=4.0, search_width=200.0),
        sym=SymConfig(samprate=samprate, symrate=symrate),
        decode=DecodeConfig(),
    )
    key = jax.random.PRNGKey(0)
    iq = jax.jit(
        lambda f, k: synthesize_iq_device(
            f, carriers, k, nsamples, samprate=samprate, symrate=symrate,
            noise_std=2500.0,
        )
    )(frames_dev, key)
    float(jnp.real(iq[0, 0]))

    B, L = iq.shape
    n = cfg.pm.fftsize
    nblocks = L // n
    blocks = iq[:, : nblocks * n].reshape(B, nblocks, n)

    @jax.jit
    def pm_only(blocks):
        carry = init_carry(B, cfg.pm)
        carry, pm_out = pm_demod_scan(carry, blocks, cfg.pm)
        bb = jnp.swapaxes(pm_out.baseband, 0, 1).reshape(B, nblocks * n)
        return bb, bb.sum(dtype=jnp.int32)

    @jax.jit
    def sym_only(baseband):
        wlen = window_samples(cfg.sym)
        nwindows = max((nblocks * n - initial_firstsample(cfg.sym)) // wlen - 1, 0)
        _, sym_out = symdemod_scan(baseband, cfg.sym, nwindows)
        soft = jnp.swapaxes(sym_out.soft, 0, 1).reshape(B, -1)
        return soft, soft.sum(dtype=jnp.int32)

    bb, chk = pm_only(blocks)
    float(chk)
    soft, chk2 = sym_only(bb)
    float(chk2)

    total = B * nblocks * n
    for name, fn, arg in (("pmdemod", pm_only, blocks), ("symdemod", sym_only, bb)):
        for rep in range(3):
            t0 = time.perf_counter()
            _, c = fn(arg)
            float(c)
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "stage": name,
                        "rep": rep,
                        "wall_s": round(dt, 3),
                        "Msamp_per_s": round(total / dt / 1e6, 1),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
