"""Probe: which int16 vector ops does this Mosaic toolchain legalize?

Round 3 established that packed-i16 `cmpi`/`minsi` fail to legalize
(ops/viterbi_pallas_fused.py docstring), which forced the fused ACS into
int32 compute.  But the bool-free ACS needs only add/sub/shift/and/xor
and vector×scalar mul on i16 — this probe checks exactly that op set in
isolation, on the real device, so a future 2×-lane int16 ACS variant has
a measured go/no-go instead of a blanket assumption.

Usage: python scripts/tpu_i16_probe.py   (safe to run standalone; each
op set compiles its own tiny kernel so one failure doesn't mask others)
"""

import json
import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = rng.integers(-2000, 2000, (8, 256), dtype=np.int16)
    y = rng.integers(-2000, 2000, (8, 256), dtype=np.int16)

    cases = {
        # the exact op set of the bool-free ACS (_acs_pair/_isel)
        "add_sub": lambda a, b: (a + b) - (b - a),
        "shift_sign": lambda a, b: ((b - a) >> 15) & jnp.int16(1),
        "xor_and_sel": lambda a, b: b ^ ((a ^ b) & jnp.int16(-1)),
        "mul_scalar": lambda a, b: a * jnp.int16(17) + b,
        "iota_i16": lambda a, b: a
        + jax.lax.broadcasted_iota(jnp.int16, (8, 256), 1),
        "downcast_i32": lambda a, b: (a.astype(jnp.int32) + 7).astype(
            jnp.int16
        ),
        # known-bad (for signal): packed-i16 compare / min
        "cmpi_KNOWN_BAD": lambda a, b: jnp.where(a > b, a, b),
        "minsi_KNOWN_BAD": lambda a, b: jnp.minimum(a, b),
    }

    for name, fn in cases.items():
        def kern(a_ref, b_ref, o_ref, fn=fn):
            o_ref[...] = fn(a_ref[...], b_ref[...])

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int16),
            )(jnp.asarray(x), jnp.asarray(y))
            got = np.asarray(out)
            want = np.asarray(fn(jnp.asarray(x), jnp.asarray(y)))
            ok = np.array_equal(got, want)
            print(json.dumps({"op": name, "compiles": True, "correct": bool(ok)}), flush=True)
        except Exception as e:  # noqa: BLE001 — per-op verdicts are the product
            msg = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps({"op": name, "compiles": False, "error": msg}), flush=True)


if __name__ == "__main__":
    main()
