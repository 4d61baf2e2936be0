"""Measure the fused-cycle Pallas Viterbi kernels on real TPU hardware.

Usage: python scripts/tpu_fused_bench.py [--dtype int16|int32] [--bits N]
       [--batch B] [--smoke]

Prints one JSON line per measurement.  Designed to survive a flaky
tunneled runtime: every device sync fetches a tiny reduced scalar
(device_get) rather than trusting block_until_ready.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync_scalar(x):
    """Force real completion by pulling a reduced scalar to host."""
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.astype(jnp.int32) & 0xFF) & 0xFFFF))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="int16")
    ap.add_argument("--bits", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(json.dumps({"event": "device", "device": str(dev)}), flush=True)

    from isee3_decoder_tpu.config import DEFAULT_CODE
    from isee3_decoder_tpu.ops import encode as enc
    from isee3_decoder_tpu.ops import viterbi_pallas_fused as vpf

    code = DEFAULT_CODE
    dtype = jnp.int16 if args.dtype == "int16" else jnp.int32
    rng = np.random.default_rng(7)

    nbits = 46 if args.smoke else args.bits
    bits = rng.integers(0, 2, size=nbits - (code.k - 1))
    bits = np.concatenate([bits, np.zeros(code.k - 1, np.int64)])
    sym_bits = np.asarray(
        enc.encode_bits(jnp.asarray(bits, jnp.uint8), 0, code)[0]
    )
    # clean offset-binary soft symbols
    syms = np.where(sym_bits > 0, 255, 0).astype(np.int32)
    syms_j = jnp.asarray(np.broadcast_to(syms, (args.batch, syms.size)))

    t0 = time.time()
    out = vpf.decode_frame_fused(
        syms_j, nbits, 0, 0, code, dtype=dtype
    )
    h = sync_scalar(out)
    compile_s = time.time() - t0
    decoded = np.asarray(out[0])
    ok = bool(np.array_equal(decoded, bits.astype(np.uint8)))
    print(
        json.dumps(
            {
                "event": "smoke" if args.smoke else "compile",
                "nbits": nbits,
                "batch": args.batch,
                "dtype": args.dtype,
                "compile_s": round(compile_s, 2),
                "correct": ok,
                "hash": h,
            }
        ),
        flush=True,
    )
    if args.smoke:
        sys.exit(0 if ok else 1)
    if not ok:
        print(json.dumps({"event": "error", "msg": "decode mismatch"}))
        sys.exit(1)

    # Timed reps of the ACS-only path (update_frame_fused), which is the
    # hot kernel; chainback is a separate cheap scan.
    metrics0 = jnp.zeros((args.batch, code.nstates), dtype)
    for rep in range(args.reps):
        t0 = time.time()
        m, decs, tot = vpf.update_frame_fused(metrics0, syms_j, nbits, code)
        sync_scalar(tot)
        dt = time.time() - t0
        bps = args.batch * nbits / dt
        print(
            json.dumps(
                {
                    "event": "acs",
                    "rep": rep,
                    "nbits": nbits,
                    "batch": args.batch,
                    "dtype": args.dtype,
                    "wall_s": round(dt, 3),
                    "ms_per_bit": round(1e3 * dt / nbits, 3),
                    "frame_bits_per_s": round(bps, 1),
                }
            ),
            flush=True,
        )

    # Full decode (ACS + chainback) timing
    for rep in range(args.reps):
        t0 = time.time()
        out = vpf.decode_frame_fused(syms_j, nbits, 0, 0, code, dtype=dtype)
        sync_scalar(out)
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "event": "full_decode",
                    "rep": rep,
                    "wall_s": round(dt, 3),
                    "frame_bits_per_s": round(args.batch * nbits / dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
