"""Sweep the Fano while_loop unroll factor on TPU at bench-like lanes.

The lockstep Fano walk's wall time = iterations x (dispatch + body).
Unrolling amortizes dispatch but pays compile size and wasted work on
lanes that finish mid-iteration; this probe measures the tradeoff at a
mid-SNR operating point where real threshold walks happen (the bench's
noisy regime: quicklook rejects, Fano decodes everything).

Env: PROBE_LANES (default 256), PROBE_NOISE (symbol noise sigma,
default 34 — chosen so most lanes need hundreds of forward looks but
all succeed, like BENCH_NOISE_STD2=50000 in bench.py).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from isee3_decoder_tpu.config import FRAMEBITS, SYNC_STATE, SYNCWORD
    from isee3_decoder_tpu.models.decode import DecodeConfig
    from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode
    from isee3_decoder_tpu.utils import testsignal

    cfg = DecodeConfig()
    rng = np.random.default_rng(0)
    nlanes = int(os.environ.get("PROBE_LANES", "256"))
    noise = float(os.environ.get("PROBE_NOISE", "34"))
    frames = testsignal.random_frames(rng, nlanes)
    hard = np.asarray(testsignal.frames_to_symbols(frames)).reshape(
        nlanes, 2 * FRAMEBITS
    )
    soft = np.where(hard > 0, 178, 78).astype(np.float64)
    syms = np.clip(
        np.rint(soft + rng.normal(0, noise, soft.shape)), 0, 255
    ).astype(np.uint8)
    fdev = jnp.asarray(syms)
    k = cfg.code.k
    tail = SYNCWORD & ((1 << (k - 1)) - 1)
    met = jnp.asarray(cfg.mettab())

    for unroll in (4, 8, 16, 32):
        params = FanoParams(
            delta=cfg.fano_delta, maxcycles=cfg.fano_maxcycles, unroll=unroll
        )

        def run():
            return fano_decode(
                fdev, met, FRAMEBITS, SYNC_STATE, tail, cfg.code, params
            )

        res = run()
        ok0 = int(jnp.sum(res.goodbits == FRAMEBITS))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = run()
            _ = int(jnp.sum(r.goodbits))
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "unroll": unroll,
                    "wall_s": round(best, 4),
                    "lanes_ok": ok0,
                    "lanes": nlanes,
                    "max_cycles": int(jnp.max(res.cycles)),
                    "mean_cycles": round(float(jnp.mean(res.cycles)), 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
