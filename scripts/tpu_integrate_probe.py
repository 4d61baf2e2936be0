"""Micro-benchmark: integrate_from_csum formulations on TPU.

I[b, m] = csum[e0] - 2 csum[e1] + csum[e2],  edges e = first_b + E[j]
(the absolute-rounded trial_demod edge table; parity ties ignored here —
this probes the alignment/gather cost, which dominates).

A: elementwise take_along_axis of all B*2049 edges (current impl)
B: channel-loop contiguous dynamic_slice alignment + constant-index take
C: alignment via take_along_axis with contiguous (B, span) indices
D: alignment via vmapped dynamic_slice + constant-index take
E: alignment (channel-loop) + grouped static strided-slice evaluation
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, fn, *args, reps=3):
    try:
        ref = fn(*args)
        ref.block_until_ready()
        chk = float(jnp_abs_sum(ref))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp_abs_sum(fn(*args)))
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps({"op": name, "wall_s": round(best, 5), "chk": chk}),
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"op": name, "error": str(e)[:160]}), flush=True)


def jnp_abs_sum(x):
    import jax.numpy as jnp

    return jnp.abs(x.astype(jnp.float32)).sum()


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("PROF_NCHAN", "128"))
    nsym = 1024
    hc = 250000.0 / 1024.0 / 2  # bench halfclock
    rel = np.concatenate([[0.0], np.cumsum(np.full(2 * nsym, hc))])
    E = np.floor(rel).astype(np.int32) + (rel - np.floor(rel) > 0.5)
    E = E.astype(np.int32)  # (2049,) static edge table
    span = int(E[-1]) + 2
    L = 2_100_000

    rng = np.random.default_rng(0)
    csum = jnp.asarray(
        rng.integers(-(2**30), 2**30, (B, L + 1), dtype=np.int64).astype(np.int32)
    )
    first = jnp.asarray(rng.integers(500, 900, B).astype(np.int32))
    Ed = jnp.asarray(E)

    def integ_from_g(g):  # g: (B, 2049)
        seg = g[:, 1:] - g[:, :-1]
        seg = seg.reshape(B, nsym, 2)
        return seg[:, :, 1] - seg[:, :, 0]

    @jax.jit
    def variant_a(csum, first):
        edges = first[:, None] + Ed[None, :]
        g = jnp.take_along_axis(csum, edges, axis=-1)
        return integ_from_g(g)

    def align_loop(csum, first):
        def body(b, out):
            row = jax.lax.dynamic_slice(
                csum, (b, jnp.zeros((), jnp.int32)), (1, csum.shape[1])
            )[0]
            sl = jax.lax.dynamic_slice(row, (first[b],), (span,))
            return jax.lax.dynamic_update_slice(out, sl[None, :], (b, 0))

        out = jnp.zeros((B, span), jnp.int32)
        return jax.lax.fori_loop(0, B, body, out)

    def align_loop2(csum, first):
        # channel loop without the row pre-slice: 2-D dynamic_slice
        def body(b, out):
            sl = jax.lax.dynamic_slice(csum, (b, first[b]), (1, span))
            return jax.lax.dynamic_update_slice(out, sl, (b, 0))

        out = jnp.zeros((B, span), jnp.int32)
        return jax.lax.fori_loop(0, B, body, out)

    @jax.jit
    def variant_b(csum, first):
        aligned = align_loop2(csum, first)
        g = jnp.take(aligned, Ed, axis=1)
        return integ_from_g(g)

    @jax.jit
    def variant_c(csum, first):
        idx = first[:, None] + jnp.arange(span, dtype=jnp.int32)[None, :]
        aligned = jnp.take_along_axis(csum, idx, axis=-1)
        g = jnp.take(aligned, Ed, axis=1)
        return integ_from_g(g)

    @jax.jit
    def variant_d(csum, first):
        aligned = jax.vmap(
            lambda v, f: jax.lax.dynamic_slice(v, (f,), (span,))
        )(csum, first)
        g = jnp.take(aligned, Ed, axis=1)
        return integ_from_g(g)

    # E: grouped static slices on the aligned base (group symbols by
    # identical (stride, local-edge) pattern like _symbol_group_plan)
    from isee3_decoder_tpu.ops.symbols import _symbol_group_plan

    groups = _symbol_group_plan(E.astype(np.int64), 1, 1)
    print(json.dumps({"groups": len(groups) if groups else None}), flush=True)
    span_g = max(
        max(
            g["anchor"]
            + g["stride"]
            * ((g["m1"] - g["m0"]) + -(-(g["cj"][-1] + 1) // g["stride"]))
            for g in groups
        ),
        span,
    )

    def align_loop_g(csum, first):
        def body(b, out):
            sl = jax.lax.dynamic_slice(csum, (b, first[b]), (1, span_g))
            return jax.lax.dynamic_update_slice(out, sl, (b, 0))

        out = jnp.zeros((B, span_g), jnp.int32)
        return jax.lax.fori_loop(0, B, body, out)

    def grouped_integ(aligned):
        outs = []
        for g in groups:
            s, ni, a = g["stride"], g["m1"] - g["m0"], g["anchor"]
            c0, c1, c2 = g["cj"]
            ncover = -(-(c2 + 1) // s)
            r = aligned[:, a : a + s * (ni + ncover)].reshape(B, ni + ncover, s)
            d = None
            for w, cj in ((1, c0), (-2, c1), (1, c2)):
                p, col = divmod(cj, s)
                t = w * r[:, p : p + ni, col]
                d = t if d is None else d + t
            outs.append(d)
        return jnp.concatenate(outs, axis=1)

    @jax.jit
    def variant_e(csum, first):
        aligned = align_loop_g(csum, first)
        return grouped_integ(aligned)

    @jax.jit
    def align_only(csum, first):
        return align_loop_g(csum, first)[:, ::997]

    ref = np.asarray(variant_a(csum, first))
    only = os.environ.get("PROBE_ONLY", "")
    for name, fn in (
        ("A_take_along_axis", variant_a),
        ("B_chanloop_align+const_take", variant_b),
        ("C_taa_align+const_take", variant_c),
        ("D_vmap_align+const_take", variant_d),
        ("E_chanloop_align+grouped", variant_e),
        ("G_align_only", align_only),
    ):
        if only and only not in name:
            continue
        if name != "G_align_only":
            out = np.asarray(fn(csum, first))
            if not np.array_equal(out, ref):
                print(json.dumps({"op": name, "MISMATCH": True}), flush=True)
        bench(name, fn, csum, first)


if __name__ == "__main__":
    main()
