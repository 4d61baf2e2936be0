"""A/B micro-benchmarks for demod op variants, same process/run."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *args, reps=5):
    try:
        float(fn(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"op": name, "wall_s": round(best, 4)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"op": name, "error": str(e)[:150]}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("PROF_NCHAN", "128"))
    n = 65536
    nblocks = 32
    L = nblocks * n

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        return (
            jax.random.normal(k1, (nblocks, B, n), jnp.float32)
            + 1j * jax.random.normal(k2, (nblocks, B, n), jnp.float32)
        ).astype(jnp.complex64)

    iq = gen(jax.random.PRNGKey(0))
    float(jnp.real(iq[0, 0, 0]))
    freq = jnp.full((B,), 20_000.0, jnp.float32)
    fs = 250_000.0

    def scan_sum(step):
        def run(x):
            def body(acc, blk):
                return acc + step(blk), None
            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
            return acc
        return jax.jit(run)

    # --- LO variants ---
    def lo_flat(blk):
        i = jnp.arange(n, dtype=jnp.int32)
        ihi = (i // 256).astype(jnp.float32)
        ilo = (i % 256).astype(jnp.float32)
        c = freq / fs
        c256 = jnp.mod(c * 256.0, 1.0)
        cyc = c256[:, None] * ihi[None, :] + c[:, None] * ilo[None, :]
        return jnp.abs((blk * jnp.exp((-2j * np.pi) * cyc)).sum())

    def lo_outer(blk):
        c = freq / fs
        nhi = n // 256
        jhi = jnp.arange(nhi, dtype=jnp.float32)
        jlo = jnp.arange(256, dtype=jnp.float32)
        c256 = jnp.mod(c * 256.0, 1.0)
        hi = jnp.exp((-2j * np.pi) * jnp.mod(c256[:, None] * jhi[None, :], 1.0))
        fine = jnp.exp((-2j * np.pi) * jnp.mod(c[:, None] * jlo[None, :], 1.0))
        lo = (hi[:, :, None] * fine[:, None, :]).reshape(B, n)
        return jnp.abs((blk * lo).sum())

    def lo_outer3d(blk):
        # consume iq in (B, nhi, 256) shape — no flat reshape of the LO
        c = freq / fs
        nhi = n // 256
        jhi = jnp.arange(nhi, dtype=jnp.float32)
        jlo = jnp.arange(256, dtype=jnp.float32)
        c256 = jnp.mod(c * 256.0, 1.0)
        hi = jnp.exp((-2j * np.pi) * jnp.mod(c256[:, None] * jhi[None, :], 1.0))
        fine = jnp.exp((-2j * np.pi) * jnp.mod(c[:, None] * jlo[None, :], 1.0))
        x = blk.reshape(B, nhi, 256)
        return jnp.abs((x * hi[:, :, None] * fine[:, None, :]).sum())

    bench("lo_flat", scan_sum(lo_flat), iq)
    bench("lo_outer", scan_sum(lo_outer), iq)
    bench("lo_outer3d", scan_sum(lo_outer3d), iq)

    # --- prefix sum variants ---
    bb = jax.jit(
        lambda x: jnp.trunc(
            jnp.swapaxes(x, 0, 1).reshape(B, -1).real * 100
        ).astype(jnp.int16)
    )(iq)
    bb.block_until_ready()

    def ps_flat(s):
        return jnp.cumsum(s.astype(jnp.int32), axis=-1)[:, -1].sum().astype(jnp.float32)

    def ps_tiled(s, T):
        x = s.astype(jnp.int32)
        nt = L // T
        xp = x.reshape(B, nt, T)
        inner = jnp.cumsum(xp, axis=-1)
        tile_base = jnp.pad(
            jnp.cumsum(inner[:, :, -1], axis=-1)[:, :-1], ((0, 0), (1, 0))
        )
        csum = inner + tile_base[:, :, None]
        return csum[:, -1, -1].sum().astype(jnp.float32)

    bench("cumsum_flat", jax.jit(ps_flat), bb)
    for T in (256, 512, 2048, 8192):
        bench(f"cumsum_tiled_{T}", jax.jit(lambda s, T=T: ps_tiled(s, T)), bb)

    # --- windowed DFT vs FFT carrier search ---
    K = 107  # int(2*200/3.8147)+3
    first1 = jnp.full((B,), 5000, jnp.int32)  # absolute start bin - 1

    W = None

    def make_w():
        t = jnp.arange(n, dtype=jnp.float32)[:, None]
        k = jnp.arange(K, dtype=jnp.float32)[None, :]
        return jnp.exp((-2j * np.pi / n) * (t * k)).astype(jnp.complex64)

    def mix_vec(first1):
        # exact integer phase: (first1 * t) mod n, via outer product
        thi = jnp.arange(n // 256, dtype=jnp.int32)
        tlo = jnp.arange(256, dtype=jnp.int32)
        hi_ph = ((first1[:, None] * 256 % n) * thi[None, :]) % n
        lo_ph = (first1[:, None] * tlo[None, :]) % n
        hi = jnp.exp((-2j * np.pi / n) * hi_ph.astype(jnp.float32))
        lo = jnp.exp((-2j * np.pi / n) * lo_ph.astype(jnp.float32))
        return (hi[:, :, None] * lo[:, None, :]).reshape(B, n)

    def dft_win(blk, W):
        xm = blk * mix_vec(first1)
        S = xm @ W  # (B, K)
        e = S.real**2 + S.imag**2
        return e.sum()

    Wc = jax.jit(make_w)()
    Wc.block_until_ready()

    def run_dft(x, Wc):
        def body(acc, blk):
            return acc + dft_win(blk, Wc), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), x)
        return acc

    bench("dft_win_matmul", jax.jit(run_dft), iq, Wc)

    def dft_win_fact(blk):
        # Cooley-Tukey factorized: no big W in HBM
        nhi = n // 256
        xm = (blk * mix_vec(first1)).reshape(B, nhi, 256)
        thi = jnp.arange(nhi, dtype=jnp.float32)
        tlo = jnp.arange(256, dtype=jnp.float32)
        k = jnp.arange(K, dtype=jnp.float32)
        hi = jnp.exp((-2j * np.pi / n) * (256.0 * thi[:, None] * k[None, :]))
        lo2 = jnp.exp((-2j * np.pi / n) * (tlo[:, None] * k[None, :]))
        A = jnp.einsum("bht,hk->btk", xm, hi.astype(jnp.complex64))
        S = jnp.einsum("btk,tk->bk", A, lo2.astype(jnp.complex64))
        e = S.real**2 + S.imag**2
        return e.sum()

    bench("dft_win_fact", scan_sum(dft_win_fact), iq)
    bench(
        "fft_full",
        scan_sum(lambda blk: jnp.abs(jnp.fft.fft(blk, axis=-1)).sum()),
        iq,
    )


if __name__ == "__main__":
    main()
