"""Prototype: Pallas windowed matmul-DFT carrier search reading packed
raw int16 IQ (no complex64 materialization).  Checks S values against
the XLA einsum formulation and times both at bench shapes."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    INTERPRET = os.environ.get("PROBE_INTERPRET", "") == "1"
    if INTERPRET:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 16 if INTERPRET else 128
    n = 4096 if INTERPRET else 65536
    nhi = n // 256
    K = 107
    KP = 128  # lane-padded
    fs = 250_000.0

    # device-generated raw int16 interleaved IQ, packed as int32 words
    raw_i32 = jax.jit(
        lambda k: jax.random.randint(k, (B, n), -(2**31), 2**31 - 1, jnp.int32)
    )(jax.random.PRNGKey(0))
    first1 = jax.jit(
        lambda k: jax.random.randint(k, (B,), 5000, 5300, jnp.int32)
    )(jax.random.PRNGKey(1))

    kk = np.arange(KP, dtype=np.int64)
    h = np.arange(nhi, dtype=np.int64)
    tl = np.arange(256, dtype=np.int64)

    def cexp_np(num, den):
        return np.exp((-2j * np.pi / den) * num.astype(np.float32)).astype(
            np.complex64
        )

    hi0 = cexp_np((h[:, None] * kk[None, :]) % nhi, nhi)  # (nhi, KP)
    lo0 = cexp_np((tl[:, None] * kk[None, :]) % n, n)  # (256, KP)
    hi0_r = jnp.asarray(hi0.real)
    hi0_i = jnp.asarray(hi0.imag)
    lo0_r = jnp.asarray(lo0.real)
    lo0_i = jnp.asarray(lo0.imag)

    @jax.jit
    def mix_tables(first1):
        def cexp(num, den):
            return jnp.exp(
                (-2j * np.pi / den) * num.astype(jnp.float32)
            ).astype(jnp.complex64)

        mixh = cexp((h[None, :] * (first1 % nhi)[:, None]) % nhi, nhi)
        mixl = cexp((tl[None, :] * (first1 % n)[:, None]) % n, n)
        return mixh, mixl

    mixh, mixl = mix_tables(first1)

    def unpack(x):
        i16 = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
        q16 = jnp.right_shift(x, 16).astype(jnp.float32)
        return i16, q16

    # --- XLA reference (current production shape of the math) ---
    @jax.jit
    def xla_search(raw_i32, mixh, mixl):
        ir, qi = unpack(raw_i32)
        iq = (ir + 1j * qi).astype(jnp.complex64)
        x3 = iq.reshape(B, nhi, 256)
        hib = mixh[:, :, None] * jnp.asarray(hi0)[None, :, :]
        A = jnp.einsum("bht,bhk->btk", x3, hib)
        S = jnp.einsum("btk,bt,tk->bk", A, mixl, jnp.asarray(lo0))
        return S

    # --- Pallas kernel ---
    def kernel(x_ref, mhr, mhi_, mlr, mli, h0r, h0i, l0r, l0i, sr_ref, si_ref):
        x = x_ref[...]
        ir = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
        qi = jnp.right_shift(x, 16).astype(jnp.float32)
        xr = ir.reshape(8, nhi, 256)
        xi = qi.reshape(8, nhi, 256)
        dn = (((0,), (0,)), ((), ()))  # contract dim0 x dim0
        for c in range(8):
            hr = mhr[c][:, None] * h0r[...] - mhi_[c][:, None] * h0i[...]
            hi_ = mhr[c][:, None] * h0i[...] + mhi_[c][:, None] * h0r[...]
            ar = (
                jax.lax.dot_general(xr[c], hr, dn)
                - jax.lax.dot_general(xi[c], hi_, dn)
            )
            ai = (
                jax.lax.dot_general(xr[c], hi_, dn)
                + jax.lax.dot_general(xi[c], hr, dn)
            )
            wr = mlr[c][:, None] * l0r[...] - mli[c][:, None] * l0i[...]
            wi = mlr[c][:, None] * l0i[...] + mli[c][:, None] * l0r[...]
            sr = (ar * wr - ai * wi).sum(axis=0)
            si = (ar * wi + ai * wr).sum(axis=0)
            sr_ref[c, :] = sr
            si_ref[c, :] = si

    @jax.jit
    def pallas_search(raw_i32, mixh, mixl):
        grid = (B // 8,)
        bs = lambda shape: pl.BlockSpec(shape, lambda bi: (bi,) + (0,) * (len(shape) - 1))
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, n), lambda bi: (bi, 0)),
                pl.BlockSpec((8, nhi), lambda bi: (bi, 0)),
                pl.BlockSpec((8, nhi), lambda bi: (bi, 0)),
                pl.BlockSpec((8, 256), lambda bi: (bi, 0)),
                pl.BlockSpec((8, 256), lambda bi: (bi, 0)),
                pl.BlockSpec((nhi, KP), lambda bi: (0, 0)),
                pl.BlockSpec((nhi, KP), lambda bi: (0, 0)),
                pl.BlockSpec((256, KP), lambda bi: (0, 0)),
                pl.BlockSpec((256, KP), lambda bi: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((8, KP), lambda bi: (bi, 0)),
                pl.BlockSpec((8, KP), lambda bi: (bi, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, KP), jnp.float32),
                jax.ShapeDtypeStruct((B, KP), jnp.float32),
            ],
            compiler_params=None
            if INTERPRET
            else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=INTERPRET,
        )(
            raw_i32,
            mixh.real, mixh.imag, mixl.real, mixl.imag,
            hi0_r, hi0_i, lo0_r, lo0_i,
        )
        return out[0] + 1j * out[1]

    S_ref = np.asarray(xla_search(raw_i32, mixh, mixl))
    S_pal = np.asarray(pallas_search(raw_i32, mixh, mixl))
    err = np.abs(S_pal - S_ref) / (np.abs(S_ref) + 1e-3)
    print(json.dumps({"max_rel_err": float(err.max())}), flush=True)
    if INTERPRET:
        return

    def bench(name, fn, *a, reps=3):
        out = fn(*a)
        float(jnp.abs(out).sum())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.abs(fn(*a)).sum())
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)

    bench("xla_search_1blk", xla_search, raw_i32, mixh, mixl)
    bench("pallas_search_1blk", pallas_search, raw_i32, mixh, mixl)

    # scanned over 32 blocks like production
    rawT = jax.jit(
        lambda k: jax.random.randint(
            k, (32, B, n), -(2**31), 2**31 - 1, jnp.int32
        )
    )(jax.random.PRNGKey(2))

    def scan_sum(step):
        def run(x):
            def body(acc, blk):
                return acc + step(blk), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
            return acc
        return jax.jit(run)

    bench(
        "xla_search_scan32",
        scan_sum(lambda blk: jnp.abs(xla_search(blk, mixh, mixl)).sum()),
        rawT,
    )
    bench(
        "pallas_search_scan32",
        scan_sum(lambda blk: jnp.abs(pallas_search(blk, mixh, mixl)).sum()),
        rawT,
    )


if __name__ == "__main__":
    main()
