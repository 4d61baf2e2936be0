"""Full-walk Pallas Fano kernel: the entire threshold walk in ONE
device kernel with the push-down tape resident in VMEM.

Capability parity with ``fano.c`` (see ops/fano.py — this kernel
implements the identical collapsed-backtrack walk and is validated
bit-exactly against it).  Motivation (VERDICT r4 missing #3): the XLA
lockstep walk pays a fixed ~25-50 us per micro-step at tier-2 batch
widths — two indexed HBM ops plus two dense reductions dispatched per
step.  Near the Fano cliff a hopeless lane walks maxcycles*nbits
(102,400) forward looks, so that fixed cost IS the threshold-regime
block time.  Here the tape lives in VMEM (~5-10 MB for 1024-bit frames
x 128-256 lanes), every gather/scatter is a masked in-VMEM
reduce/select, and the whole walk is one ``lax.while_loop`` inside one
kernel — no per-step dispatch, no HBM round trips.

Layout: nodes on the SUBLANE axis, lanes on the LANE axis (the masked
reductions that implement per-lane dynamic tape access reduce along
sublanes, which the VPU does natively).  Per-lane walk registers are
(1, B) vectors in the loop carry.

Tape arrays (VMEM scratch, (Npad, B) int32):
  G   gamma (cumulative path metric) per pushed node
  TM0 / TM1  sorted branch metrics
  EI  (ibr << kbits) | enc — branch index and encoder hypothesis

Reference: fano.c:13-19 (struct node), fano.c:70-80 (metric
precompute), fano.c:110-189 (the walk); decode.c:202 (the call site).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isee3_decoder_tpu.config import DEFAULT_CODE, CodeSpec

# re-used pieces of the XLA walk (identical semantics, shared helpers)
from isee3_decoder_tpu.ops.fano import FanoParams, FanoResult, _metrics4


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports(nbits: int, B: int, code: CodeSpec) -> bool:
    """Static gate: packed single-word codes, VMEM-resident tape."""
    if code.kbits + 1 >= 31:
        return False
    npad = _round_up(nbits + 1, 8)
    lanes = _round_up(max(B, 1), 128)
    # 4 tape arrays + 4 metric planes + bits output, int32
    vmem = (8 * npad + npad) * lanes * 4
    return nbits >= code.k and lanes <= 256 and vmem < 12 * 1024 * 1024


def _parity_i32(x):
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


@functools.partial(
    jax.jit, static_argnames=("nbits", "code", "params", "interpret")
)
def _fano_walk_pallas(
    metrics4,  # (B, nbits, 4) int32
    init_regs,  # (8, B) int32: [tm0, tm1, enc, done, tailbits, 0, 0, 0]
    nbits: int,
    code: CodeSpec,
    params: FanoParams,
    interpret: bool = False,
):
    B = metrics4.shape[0]
    N = nbits
    npad = _round_up(N + 1, 8)
    lanes = _round_up(B, 128)
    kb = code.kbits
    k = code.k
    encmask = np.int32((1 << kb) - 1)
    tail_start = np.int32(N - (k - 1))
    delta = np.int32(params.delta)
    max_total = np.int32(params.maxcycles * nbits)
    p1 = np.int32(code.poly1 & 0xFFFFFFFF)
    p2 = np.int32(code.poly2 & 0xFFFFFFFF)
    g1f = np.int32(code.g1flip)
    g2f = np.int32(code.g2flip)
    unroll = max(params.resolved_unroll() // 4, 1)

    # (4, npad, lanes): metric plane s for node j, lane b
    m4 = jnp.transpose(metrics4.astype(jnp.int32), (2, 1, 0))  # (4, N, B)
    m4 = jnp.pad(m4, ((0, 0), (0, npad - N), (0, lanes - B)))
    regs = jnp.pad(init_regs.astype(jnp.int32), ((0, 0), (0, lanes - B)))
    # padded lanes start done (their outputs are sliced off)
    if lanes > B:
        pad_done = (jnp.arange(lanes, dtype=jnp.int32) >= B).astype(jnp.int32)
        regs = regs.at[3].max(pad_done)

    def kernel(m4_ref, regs_ref, bits_ref, stats_ref, G, TM0, TM1, EI):
        iota = jax.lax.broadcasted_iota(jnp.int32, (npad, lanes), 0)
        zero_tape = jnp.zeros((npad, lanes), jnp.int32)
        G[:] = zero_tape
        TM0[:] = zero_tape
        TM1[:] = zero_tape
        EI[:] = zero_tape

        def makesyms(enc):
            s1 = (_parity_i32(enc & p1) << 1) ^ g1f
            s2 = _parity_i32(enc & p2) ^ g2f
            return s1 | s2

        def sel4(m0, m1, m2, m3, s):
            lo = jnp.where((s & 1) == 1, m1, m0)
            hi = jnp.where((s & 1) == 1, m3, m2)
            return jnp.where(((s >> 1) & 1) == 1, hi, lo)

        row = lambda r: regs_ref[r, :][None, :]  # (1, lanes)
        tailbits = row(4)

        def body(c):
            np_i, t, cycles, done, g, tm0, tm1, enc, ibr = c
            active = 1 - done
            new_np = np_i + 1

            # ---------- forward look (register math) ----------
            tm_np = jnp.where(ibr == 0, tm0, tm1)
            ngamma = g + tm_np
            ok = (ngamma >= t).astype(jnp.int32) * active
            tighten = (g < t + delta).astype(jnp.int32) * ok
            t_fwd = jnp.where(
                tighten == 1, t + delta * ((ngamma - t) // delta), t
            )
            at_last = (np_i == (N - 1)).astype(jnp.int32)
            newly_done = ok * at_last
            advance = ok * (1 - at_last)
            violate = active * (1 - ok)

            # ---------- pop-run collapse: two sublane reductions ----------
            below = iota < np_i  # (npad, lanes)
            jr = jnp.max(
                jnp.where(below & (G[:] < t), iota, -1), axis=0, keepdims=True
            )
            jt = jnp.max(
                jnp.where(
                    below & (iota < tail_start) & ((EI[:] >> kb) == 0),
                    iota,
                    -1,
                ),
                axis=0,
                keepdims=True,
            )
            do_toggle = violate * (jt > jr).astype(jnp.int32)
            do_relax = violate * (1 - (jt > jr).astype(jnp.int32))
            target = jnp.where(do_toggle == 1, jt, jr + 1)
            from_regs = do_relax * (target == np_i).astype(jnp.int32)

            # ---------- masked one-hot gathers over the VMEM tape ----------
            midx = jnp.clip(new_np, 0, N - 1)
            mrow = iota == midx  # advance lanes: next node's metrics
            mm0 = jnp.sum(jnp.where(mrow, m4_ref[0], 0), axis=0, keepdims=True, dtype=jnp.int32)
            mm1 = jnp.sum(jnp.where(mrow, m4_ref[1], 0), axis=0, keepdims=True, dtype=jnp.int32)
            mm2 = jnp.sum(jnp.where(mrow, m4_ref[2], 0), axis=0, keepdims=True, dtype=jnp.int32)
            mm3 = jnp.sum(jnp.where(mrow, m4_ref[3], 0), axis=0, keepdims=True, dtype=jnp.int32)
            cidx = jnp.clip(target, 0, N - 1)
            crow = iota == cidx  # collapse lanes: resume node's record
            rec_g = jnp.sum(jnp.where(crow, G[:], 0), axis=0, keepdims=True, dtype=jnp.int32)
            rec_t0 = jnp.sum(jnp.where(crow, TM0[:], 0), axis=0, keepdims=True, dtype=jnp.int32)
            rec_t1 = jnp.sum(jnp.where(crow, TM1[:], 0), axis=0, keepdims=True, dtype=jnp.int32)
            rec_ei = jnp.sum(jnp.where(crow, EI[:], 0), axis=0, keepdims=True, dtype=jnp.int32)

            base_g = jnp.where(from_regs == 1, g, rec_g)
            base_tm0 = jnp.where(from_regs == 1, tm0, rec_t0)
            base_tm1 = jnp.where(from_regs == 1, tm1, rec_t1)
            base_enc = jnp.where(from_regs == 1, enc, rec_ei & encmask)
            base_ibr = jnp.where(from_regs == 1, ibr, rec_ei >> kb)

            # ---------- advance target node's fresh record ----------
            adv_enc = (enc << 1) & encmask
            lsym = makesyms(adv_enc)
            in_tail = (new_np >= tail_start).astype(jnp.int32)
            tbit = (tailbits >> jnp.clip(N - new_np - 1, 0, 31)) & 1
            tail_tm0 = sel4(mm0, mm1, mm2, mm3, (tbit * 3) ^ lsym)
            m0 = sel4(mm0, mm1, mm2, mm3, lsym)
            m1 = sel4(mm0, mm1, mm2, mm3, 3 ^ lsym)
            better1 = (m1 >= m0).astype(jnp.int32)
            sort_tm0 = jnp.where(better1 == 1, m1, m0)
            sort_tm1 = jnp.where(better1 == 1, m0, m1)
            adv_tm0 = jnp.where(in_tail == 1, tail_tm0, sort_tm0)
            adv_tm1 = jnp.where(in_tail == 1, tail_tm0, sort_tm1)
            adv_bit = jnp.where(in_tail == 1, tbit, better1)

            # ---------- merge updates ----------
            np_next = jnp.where(
                advance == 1, new_np, jnp.where(violate == 1, target, np_i)
            )
            t_next = jnp.where(
                ok == 1, t_fwd, jnp.where(do_relax == 1, t - delta, t)
            )
            done_next = jnp.maximum(done, newly_done)
            cycles_next = cycles + active
            timeout = (
                (1 - done_next) * active
                * (cycles_next >= max_total).astype(jnp.int32)
            )
            done_next = jnp.maximum(done_next, timeout)

            g_next = jnp.where(
                advance == 1, ngamma, jnp.where(violate == 1, base_g, g)
            )
            tm0_next = jnp.where(
                advance == 1, adv_tm0, jnp.where(violate == 1, base_tm0, tm0)
            )
            tm1_next = jnp.where(
                advance == 1, adv_tm1, jnp.where(violate == 1, base_tm1, tm1)
            )
            enc_next = jnp.where(
                advance == 1,
                adv_enc | adv_bit,
                jnp.where(
                    do_toggle == 1,
                    base_enc ^ 1,
                    jnp.where(
                        do_relax == 1,
                        base_enc ^ (base_ibr != 0).astype(jnp.int32),
                        enc,
                    ),
                ),
            )
            ibr_next = jnp.where(
                advance == 1,
                0,
                jnp.where(
                    do_toggle == 1,
                    base_ibr + 1,
                    jnp.where(do_relax == 1, 0, ibr),
                ),
            )

            # ---------- push scatter: masked tape update ----------
            push = (iota == np_i) & (advance == 1)
            G[:] = jnp.where(push, g, G[:])
            TM0[:] = jnp.where(push, tm0, TM0[:])
            TM1[:] = jnp.where(push, tm1, TM1[:])
            EI[:] = jnp.where(push, (ibr << kb) | enc, EI[:])

            return (
                np_next, t_next, cycles_next, done_next,
                g_next, tm0_next, tm1_next, enc_next, ibr_next,
            )

        def body_unrolled(c):
            for _ in range(unroll):
                c = body(c)
            return c

        def cond(c):
            # dtype pinned: under x64 a default int sum would promote to
            # int64, which Mosaic cannot lower
            return jnp.sum(1 - c[3], dtype=jnp.int32) > 0

        zero = jnp.zeros((1, lanes), jnp.int32)
        init = (
            zero, zero, zero, row(3), zero, row(0), row(1), row(2), zero
        )
        final = jax.lax.while_loop(cond, body_unrolled, init)
        np_f, t_f, cycles_f, done_f, g_f, tm0_f, tm1_f, enc_f, ibr_f = final

        bits_ref[:] = jnp.where(
            iota == np_f, enc_f & 1, EI[:] & 1
        )
        stats_ref[0, :] = np_f[0]
        stats_ref[1, :] = g_f[0]
        stats_ref[2, :] = cycles_f[0]
        stats_ref[3, :] = t_f[0]

    bits, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((npad, lanes), jnp.int32),
            jax.ShapeDtypeStruct((8, lanes), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((npad, lanes), jnp.int32),
            pltpu.VMEM((npad, lanes), jnp.int32),
            pltpu.VMEM((npad, lanes), jnp.int32),
            pltpu.VMEM((npad, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(m4, regs)
    return bits[:, :B], stats[:, :B]


def fano_decode_pallas(
    symbols: jax.Array,
    mettab: jax.Array,
    nbits: int,
    encstate: int | jax.Array = 0,
    tailbits: int | jax.Array = 0,
    code: CodeSpec = DEFAULT_CODE,
    params: FanoParams = FanoParams(),
    skip: jax.Array | None = None,
    interpret: bool | None = None,
) -> FanoResult:
    """Drop-in replacement for ops.fano.fano_decode on packed codes —
    same walk, tape in VMEM, one kernel launch (module docstring).

    Validated bit-exact against the XLA walk (tests/test_fano_pallas.py);
    ops.fano.fano_decode dispatches here on the TPU backend when
    ``supports`` allows.
    """
    if symbols.ndim == 1:
        symbols = symbols[None, :]
    B = symbols.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert supports(nbits, B, code), "use ops.fano.fano_decode"

    # Pad the batch to full lane width BEFORE the jitted walk so every
    # caller shape compiles to at most TWO programs (128 / 256 lanes).
    # The kernel pads to lane multiples internally anyway — without
    # this, each distinct tier-2 straggler count would trace and
    # compile its own ~40 s variant (pad lanes run skip=True and cost
    # nothing: they start done).
    lanes = _round_up(max(B, 1), 128)
    if not interpret and lanes != B:
        pad = lanes - B
        symbols = jnp.pad(symbols, ((0, pad), (0, 0)))

        def padv(v):  # per-lane encstate/tailbits arrays pad too
            v = jnp.asarray(v)
            return jnp.pad(v, (0, pad)) if v.ndim == 1 else v

        encstate = padv(encstate) if isinstance(encstate, jax.Array) else encstate
        tailbits = padv(tailbits) if isinstance(tailbits, jax.Array) else tailbits
        if skip is None:
            skip = jnp.arange(lanes) >= B
        else:
            skip = jnp.concatenate(
                [jnp.broadcast_to(jnp.asarray(skip, bool), (B,)),
                 jnp.ones((pad,), bool)]
            )
        full = fano_decode_pallas(
            symbols, mettab, nbits, encstate, tailbits, code, params,
            skip, interpret,
        )
        return FanoResult(
            bits=full.bits[:B],
            goodbits=full.goodbits[:B],
            metric=full.metric[:B],
            cycles=full.cycles[:B],
        )

    N = nbits
    kb = code.kbits
    encmask = jnp.int32((1 << kb) - 1)
    metrics4 = _metrics4(symbols, mettab, N)

    # root node setup (fano.c:81-107), identical to the XLA walk
    start_enc = jnp.broadcast_to(jnp.asarray(encstate, jnp.int32), (B,))
    tailb = jnp.broadcast_to(jnp.asarray(tailbits, jnp.int32), (B,))
    enc0 = (start_enc << 1) & encmask
    from isee3_decoder_tpu.ops.fano import _makesyms

    lsym0 = _makesyms(enc0, code)
    bidx = jnp.arange(B)
    m0 = metrics4[:, 0][bidx, lsym0]
    m1 = metrics4[:, 0][bidx, 3 ^ lsym0]
    better1 = m1 >= m0
    tm0_r = jnp.where(better1, m1, m0)
    tm1_r = jnp.where(better1, m0, m1)
    bit_r = better1.astype(jnp.int32)

    done0 = (
        jnp.zeros((B,), jnp.int32)
        if skip is None
        else jnp.broadcast_to(jnp.asarray(skip, bool), (B,)).astype(jnp.int32)
    )
    zero = jnp.zeros((B,), jnp.int32)
    init_regs = jnp.stack(
        [tm0_r, tm1_r, enc0 | bit_r, done0, tailb, zero, zero, zero]
    )

    bits_t, stats = _fano_walk_pallas(
        metrics4, init_regs, nbits, code, params, interpret
    )
    bits = bits_t[:N].T.astype(jnp.uint8)  # (B, N)
    goodbits = stats[0] + 1
    # fano.c:193-202 partial-byte convention (see ops.fano)
    valid = (
        jnp.arange(N, dtype=jnp.int32)[None, :]
        < ((goodbits // 8) * 8)[:, None]
    )
    bits = jnp.where(valid, bits, 0).astype(jnp.uint8)
    return FanoResult(
        bits=bits, goodbits=goodbits, metric=stats[1], cycles=stats[2]
    )
