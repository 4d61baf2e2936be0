"""Profile decode_frames_batch sub-steps on TPU at bench shapes."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from isee3_decoder_tpu.config import (
        FRAMEBITS,
        FRAMESYMBOLS,
        SYNC_STATE,
        SYNCBITS,
        SYNCWORD,
    )
    from isee3_decoder_tpu.models.decode import DecodeConfig
    from isee3_decoder_tpu.ops.encode import bits_to_bytes
    from isee3_decoder_tpu.ops.fano import fano_decode
    from isee3_decoder_tpu.ops.syncword import verify_frame
    from isee3_decoder_tpu.utils import testsignal

    cfg = DecodeConfig()
    rng = np.random.default_rng(0)
    nlanes = 128  # 32 chan x 4 frames
    frames = testsignal.random_frames(rng, nlanes)
    hard = np.asarray(testsignal.frames_to_symbols(frames)).reshape(
        nlanes, 2 * FRAMEBITS
    )  # 0/1 channel symbols, one row per frame
    # offset-128 soft decisions at decode.c:128 amplitude (±100) + mild
    # Gaussian-ish noise so Fano does real work
    soft = np.where(hard > 0, 228, 28).astype(np.int32)
    syms = np.clip(soft + rng.integers(-25, 25, soft.shape), 0, 255).astype(np.uint8)
    fdev = jnp.asarray(syms)
    k = cfg.code.k
    tail = SYNCWORD & ((1 << (k - 1)) - 1)
    met = jnp.asarray(cfg.mettab())

    def run_fano():
        return fano_decode(
            fdev, met, FRAMEBITS, SYNC_STATE, tail, cfg.code, cfg.fano_params()
        )

    res = run_fano()
    _ = int(jnp.sum(res.goodbits))
    for rep in range(3):
        t0 = time.perf_counter()
        res = run_fano()
        ngood = int(jnp.sum(res.goodbits))
        t_fano = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "step": "fano_device",
                    "rep": rep,
                    "wall_s": round(t_fano, 3),
                    "lanes": nlanes,
                    "all_ok": ngood == nlanes * FRAMEBITS,
                    "max_cycles": int(jnp.max(res.cycles)),
                }
            ),
            flush=True,
        )

    t0 = time.perf_counter()
    bits_host = np.asarray(res.bits)
    t = time.perf_counter() - t0
    print(json.dumps({"step": "fetch_bits", "wall_s": round(t, 3), "MB": bits_host.nbytes / 1e6}), flush=True)

    t0 = time.perf_counter()
    good = np.asarray(verify_frame(jnp.asarray(bits_host)))
    data = np.asarray(bits_to_bytes(jnp.asarray(bits_host)))
    t = time.perf_counter() - t0
    print(json.dumps({"step": "verify+pack_roundtrip", "wall_s": round(t, 3), "good": int(good.sum())}), flush=True)

    # device-side verify/pack on res.bits directly (no host round trip)
    @jax.jit
    def verify_pack(bits):
        return verify_frame(bits), bits_to_bytes(bits)

    g, d = verify_pack(res.bits)
    int(jnp.sum(g))
    t0 = time.perf_counter()
    g, d = verify_pack(res.bits)
    int(jnp.sum(g))
    t = time.perf_counter() - t0
    print(json.dumps({"step": "verify+pack_device", "wall_s": round(t, 3)}), flush=True)
    t0 = time.perf_counter()
    dn = np.asarray(d); gn = np.asarray(g)
    t = time.perf_counter() - t0
    print(json.dumps({"step": "fetch_packed", "wall_s": round(t, 3), "MB": dn.nbytes / 1e6}), flush=True)


if __name__ == "__main__":
    main()
