"""Fused-cycle Pallas kernels for the in-place Viterbi ACS.

Builds on the rotating-layout formulation (ops/viterbi_inplace.py): over
one W-step cycle (W = K-1) the butterfly pair offset walks
2^(W-1), 2^(W-2), …, 1.  View the metric array as a
(2^ROWB, 2^COLB) matrix (ROWB top bits = rows).  Then:

* steps 0..ROWB-1 pair elements across **rows** (same column) — a
  column tile of the matrix contains every pair it needs, so all ROWB
  steps run back-to-back in VMEM on one HBM read+write  (kernel A);
* steps ROWB..W-1 pair elements across **columns** (same row) with
  offsets < 2^COLB — a row tile containing full rows runs the remaining
  W-ROWB steps in VMEM on one more read+write (kernel B).

Per decoded bit this is ~2/W metric passes instead of 1 — at K=24
(W=23, ROWB=8, COLB=15) metric traffic drops from 32 MB/bit to
~2.8 MB/bit, leaving decision output (1 MB/bit) and compute as the
limits.  Branch bits are computed in-kernel from position iotas:
branch(p) = flip ^ parity(p & rotr^t(poly_mask)), split into row/column
mask parities.  Decisions come out in the same canonical sublane-packed
layout as viterbi_inplace (bit row%32 of word (row//32)*128 + lane for
flat position p = row*128 + lane), so chainback_inplace works
unchanged.

Renormalization runs once per cycle *outside* the kernels (one metric
pass per W steps; int16 growth over a cycle is ≤ W*510 + spread, well
inside range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isee3_decoder_tpu.config import DEFAULT_CODE, CodeSpec
from isee3_decoder_tpu.ops import viterbi as vit
from isee3_decoder_tpu.ops.viterbi_inplace import (
    StreamState,
    _branch_masks,
    _rotr,
    chainback_inplace,
)


def _geometry(code: CodeSpec) -> tuple[int, int, int]:
    """(W, ROWB, COLB): row bits cover the steps with offsets >= 2^COLB."""
    w = code.k - 1
    colb = min(15, w - 1)
    rowb = w - colb
    return w, rowb, colb


def _step_masks(code: CodeSpec, t: int) -> tuple[int, int, int, int]:
    """Row/col parity masks for both polynomials at cycle step t."""
    w = code.k - 1
    _, rowb, colb = _geometry(code)
    q1, q2 = _branch_masks(code)
    m1 = _rotr(q1, t % w, w)
    m2 = _rotr(q2, t % w, w)
    colmask = (1 << colb) - 1
    return m1 >> colb, m1 & colmask, m2 >> colb, m2 & colmask


def _acs_pair(lo, hi, b0, b1, s0, s1, mdt):
    """Bool-free ACS: decisions via the sign bit of the difference and
    survivors via mask-select.  Same tie-break as the reference (keep
    a0/a2 on equality, viterbi224_sse2.c:303-321).  Bool/i16 vector ops
    are avoided deliberately — the axon Mosaic build cannot legalize
    minsi/cmpi on packed i16 nor i1 reshapes."""
    metric = ((s0 + b0 * (255 - 2 * s0)) + (s1 + b1 * (255 - 2 * s1))).astype(mdt)
    m_metric = jnp.asarray(510, mdt) - metric
    a0 = lo + metric
    a1 = hi + m_metric
    a2 = lo + m_metric
    a3 = hi + metric
    d0 = (a1 - a0) >> 31 & 1  # a0 > a1
    d1 = (a3 - a2) >> 31 & 1  # a2 > a3
    return (
        _isel(d0, a1, a0),
        _isel(d1, a3, a2),
        d0,
        d1,
    )


def _isel(bit, x, y):
    """Branchless select: x where bit==1 else y (bit in {0,1} int32).

    Bool vectors are avoided entirely — the axon Mosaic build fails on
    i1 reshapes, i8->i1 truncations, and packed-i16 compares.
    """
    return y ^ ((x ^ y) & -bit)


def _parity(x):
    """XOR-fold parity (Mosaic-safe; no population_count dependency)."""
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


def _mask_parity(row_iota, col_iota, rmask: int, cmask: int):
    """parity(row & rmask) ^ parity(col & cmask) with single-bit masks
    reduced to a shift+and (no XOR fold)."""
    parts = []
    for iota, mask in ((row_iota, rmask), (col_iota, cmask)):
        if mask == 0:
            continue
        if mask & (mask - 1) == 0:  # one bit: direct extract
            parts.append((iota >> (mask.bit_length() - 1)) & 1)
        else:
            parts.append(_parity(iota & mask))
    if not parts:
        return 0
    out = parts[0]
    for p in parts[1:]:
        out = out ^ p
    return out


def _pb_pair(row_iota, col_iota, rh1, cl1, rh2, cl2, code: CodeSpec):
    """Both branch-bit planes for one step.

    pb1 is derived from pb0 via parity(x & (m1 ^ m2)) — for quick-look-in
    codes the combined mask has a single bit (poly1 ^ poly2 == 0b10
    rotated), so the second full XOR fold collapses to one shift+and.
    """
    pb0 = _mask_parity(row_iota, col_iota, rh1, cl1) ^ code.g1flip
    d = _mask_parity(row_iota, col_iota, rh1 ^ rh2, cl1 ^ cl2)
    return pb0, pb0 ^ d ^ code.g1flip ^ code.g2flip


def _pack_words(dd, nrows, ncols):
    """(nrows, ncols) 0/1 int32 decision bits at positions
    p = (row_base + r)*ncols_global… — packed along the canonical layout
    *within this block*: returns (nrows * ncols // 4096, 128) int32 words
    where word (32a+j)*? … see module docstring.  Requires ncols % 4096
    == 0 (so word groups don't straddle blocks).
    """
    # layout per row: ncols -> (ncols//128 lanes-rows); word g collects 32
    # consecutive lane-rows at fixed lane.
    c128 = ncols // 128
    dd = dd.reshape(nrows * (c128 // 32), 32, 128)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)
    words = (dd << shifts).sum(axis=1, dtype=jnp.int32)
    return words  # (nrows * c128//32, 128)


def _kernel_a(syms_ref, base_ref, m_ref, out_ref, dec_ref, *, code, nsteps, ta):
    """Row-pairing steps 0..nsteps-1 on a (2^ROWB, TA) column tile.

    Arithmetic runs in int32 regardless of the HBM metric dtype: the
    axon Mosaic build cannot legalize compare/min on packed int16
    vregs.  The int16 range is maintained by the per-cycle renorm, so
    the final downcast is lossless.
    """
    w, rowb, colb = _geometry(code)
    nrows = 1 << rowb
    mdt = jnp.int32
    c = pl.program_id(1)
    col0 = c * ta

    # base_ref carries the deferred renormalization offset (the previous
    # cycle's global min, computed from kernel B's tile minima) — the
    # subtraction fuses into this kernel's read pass, so no separate
    # full-array renorm pass is needed (viterbi224_sse2.c:351-377's lazy
    # renorm, restructured for the fused cycle).
    m = m_ref[0].astype(jnp.int32) - base_ref[pl.program_id(0)]  # (nrows, TA)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, ta), 1) + col0
    row_iota_full = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)

    for t in range(nsteps):
        rh1, cl1, rh2, cl2 = _step_masks(code, t)
        half = nrows >> (t + 1)
        v = m.reshape(1 << t, 2, half, ta)
        lo = v[:, 0]
        hi = v[:, 1]
        # positions of lo elements: rows with bit (rowb-1-t) == 0
        lo_rows = row_iota_full.reshape(1 << t, 2, half, 1)[:, 0]
        pb0, pb1 = _pb_pair(lo_rows, col_iota, rh1, cl1, rh2, cl2, code)
        s0 = syms_ref[pl.program_id(0), 2 * t]
        s1 = syms_ref[pl.program_id(0), 2 * t + 1]
        nl, nh, d0, d1 = _acs_pair(lo, hi, pb0, pb1, s0, s1, mdt)
        m = jnp.stack([nl, nh], axis=1).reshape(nrows, ta)
        dec = jnp.stack([d0, d1], axis=1).reshape(nrows, ta)
        # (colgroup, 128) merged into one trailing dim so the Mosaic
        # block-shape rule (last dim block divisible by 128) holds when a
        # column tile covers only part of the row's word groups.
        dec_ref[0, t] = _pack_words(dec, nrows, ta).reshape(
            nrows, (ta // 4096) * 128
        )
    out_ref[0] = m.astype(out_ref.dtype)


def _kernel_b(
    syms_ref, base_ref, colpar_ref, m_ref, out_ref, dec_ref, min_ref,
    *, code, nsteps, rb,
):
    """Column-pairing steps ROWB..ROWB+nsteps-1 on a (RB, 2^COLB) row
    tile (full rows).  int32 arithmetic — see _kernel_a.

    The butterfly partner m[p ^ o] is fetched with two static rolls of
    the column axis plus a select; reshape-based pairing is impossible
    here because Mosaic cannot shape-cast once the pair offset drops
    below a lane tile (o < 128).

    The column-index functions of each step — the two branch-parity
    folds parity(col_lo & mask) and the pair-position bit — are pure
    functions of (step, column) and were ~half the per-element vector
    work when computed in-kernel (an ~11-op XOR fold per mask per
    element per step).  They arrive precomputed in ``colpar_ref``
    ((3*nsteps, ncols): [pb0-col, d-col, hi-bit] per step), whose block
    index is constant across the grid so Pallas fetches it ONCE per
    call; the kernel reduces each fold to one broadcast XOR against the
    (rb, 1) row parity.
    """
    w, rowb, colb = _geometry(code)
    ncols = 1 << colb
    r = pl.program_id(1)
    row0 = r * rb

    m = m_ref[0].astype(jnp.int32)  # (rb, ncols)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0) + row0

    for j in range(nsteps):
        t = rowb + j
        rh1, cl1, rh2, cl2 = _step_masks(code, t)
        # row-parity halves of the two branch planes ((rb, 1) — tiny)
        r0 = _mask_parity(row_iota, row_iota, rh1, 0)
        rd = _mask_parity(row_iota, row_iota, rh1 ^ rh2, 0)
        # (1, ncols) slices — 2-D keeps Mosaic on the plain vector path
        cp0 = colpar_ref[3 * j : 3 * j + 1]  # parity(col_lo & cl1)
        cpd = colpar_ref[3 * j + 1 : 3 * j + 2]  # parity(col_lo & (cl1^cl2))
        hi_bit = colpar_ref[3 * j + 2 : 3 * j + 3]  # 1 at odd pair positions
        pb0 = r0 ^ cp0 ^ code.g1flip
        pb1 = pb0 ^ rd ^ cpd ^ code.g1flip ^ code.g2flip
        s = w - 1 - t
        o = 1 << s
        # syms_ref holds only this phase's pairs, indexed by j not t
        s0 = syms_ref[pl.program_id(0), 2 * j]
        s1 = syms_ref[pl.program_id(0), 2 * j + 1]
        metric = (s0 + pb0 * (255 - 2 * s0)) + (s1 + pb1 * (255 - 2 * s1))
        m_metric = 510 - metric
        partner = _isel(hi_bit, jnp.roll(m, o, axis=1), jnp.roll(m, -o, axis=1))
        keep = m + metric  # a0 at lo positions, a3 at hi positions
        swap = partner + m_metric  # a1 at lo positions, a2 at hi positions
        # strict compares as 0/1 ints: sign bit of the difference
        d = swap - keep
        c1 = d >> 31 & 1  # keep > swap  (d0 = a0 > a1)
        c2 = (0 - d) >> 31 & 1  # swap > keep  (d1 = a2 > a3)
        dec = _isel(hi_bit, c2, c1)
        take_swap = dec ^ hi_bit
        m = _isel(take_swap, swap, keep)
        dec_ref[0, j] = _pack_words(dec, rb, ncols).reshape(
            rb, ncols // 4096, 128
        )
    out_ref[0] = m.astype(out_ref.dtype)
    # per-tile minimum for the next cycle's fused renorm (broadcast into
    # an (8, 128) tile — Mosaic's minimum output block granularity)
    min_ref[0, 0] = jnp.full((8, 128), jnp.min(m), jnp.int32)


def _colpar_planes(code: CodeSpec, nsteps: int) -> np.ndarray:
    """(3*nsteps, 2^COLB) int32 column planes for kernel B: per step the
    column halves of the two branch-parity folds (evaluated at the pair's
    LOW column, col & ~o) and the high-position bit.  Static per
    (code, nsteps) — embedded as a jit constant, fetched into VMEM once
    per pallas_call."""
    w, rowb, colb = _geometry(code)
    cols = np.arange(1 << colb, dtype=np.int64)
    rows = []
    for j in range(nsteps):
        t = rowb + j
        _, cl1, _, cl2 = _step_masks(code, t)
        s = w - 1 - t
        o = 1 << s
        for mask in (cl1 & ~o, (cl1 ^ cl2) & ~o):
            v = cols & mask
            p = np.zeros_like(v)
            while mask:
                p ^= v & 1
                v >>= 1
                mask >>= 1
            rows.append(p)
        rows.append((cols >> s) & 1)
    return np.asarray(rows, dtype=np.int32)


@functools.partial(
    jax.jit, static_argnames=("code", "nsteps", "ta", "interpret")
)
def cycle_a(
    metrics: jax.Array,
    syms: jax.Array,
    code: CodeSpec = DEFAULT_CODE,
    nsteps: int | None = None,
    ta: int = 8192,
    interpret: bool = False,
    base: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Steps 0..nsteps-1 (row-pairing phase).

    metrics: (B, 2^W) in P_0 layout; syms: (B, 2*nsteps) int32.
    base: optional (B,) int32 deferred renorm offset subtracted from the
    metrics as they are read (fused lazy renormalization).
    Returns (metrics after nsteps, decisions (B, nsteps, 2^W//32)).
    """
    w, rowb, colb = _geometry(code)
    if nsteps is None:
        nsteps = rowb
    assert 1 <= nsteps <= rowb
    B, n = metrics.shape
    nrows = 1 << rowb
    ncols = 1 << colb
    ta = min(ta, ncols)
    assert ncols % ta == 0 and ta % 4096 == 0
    ntiles = ncols // ta

    m3 = metrics.reshape(B, nrows, ncols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, ntiles),
        in_specs=[pl.BlockSpec((1, nrows, ta), lambda b, c, *_: (b, 0, c))],
        out_specs=(
            pl.BlockSpec((1, nrows, ta), lambda b, c, *_: (b, 0, c)),
            pl.BlockSpec(
                (1, nsteps, nrows, (ta // 4096) * 128),
                lambda b, c, *_: (b, 0, 0, c),
            ),
        ),
    )
    kern = functools.partial(_kernel_a, code=code, nsteps=nsteps, ta=ta)
    new, dec = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, nrows, ncols), metrics.dtype),
            jax.ShapeDtypeStruct(
                (B, nsteps, nrows, (ncols // 4096) * 128), jnp.int32
            ),
        ),
        grid_spec=grid_spec,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        syms.astype(jnp.int32),
        jnp.zeros((B,), jnp.int32)
        if base is None
        else jnp.asarray(base, jnp.int32),
        m3,
    )
    return new.reshape(B, n), dec.reshape(B, nsteps, n // 32).astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("code", "nsteps", "rb", "interpret")
)
def cycle_b(
    metrics: jax.Array,
    syms: jax.Array,
    code: CodeSpec = DEFAULT_CODE,
    nsteps: int | None = None,
    rb: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Steps ROWB..ROWB+nsteps-1 (column-pairing phase).

    metrics: (B, 2^W) in P_ROWB layout; syms: (B, 2*nsteps) for those
    steps.  Returns (metrics, decisions (B, nsteps, 2^W//32),
    mins (B,) int32 — the global metric min, for the next cycle's fused
    renorm).
    """
    w, rowb, colb = _geometry(code)
    if nsteps is None:
        nsteps = w - rowb
    assert 1 <= nsteps <= w - rowb
    B, n = metrics.shape
    nrows = 1 << rowb
    ncols = 1 << colb
    rb = min(rb, nrows)
    assert nrows % rb == 0
    ntiles = nrows // rb

    m3 = metrics.reshape(B, nrows, ncols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, ntiles),
        in_specs=[
            # constant block index: fetched into VMEM once per call
            pl.BlockSpec((3 * nsteps, ncols), lambda b, r, *_: (0, 0)),
            pl.BlockSpec((1, rb, ncols), lambda b, r, *_: (b, r, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, rb, ncols), lambda b, r, *_: (b, r, 0)),
            pl.BlockSpec(
                (1, nsteps, rb, ncols // 4096, 128),
                lambda b, r, *_: (b, 0, r, 0, 0),
            ),
            pl.BlockSpec((1, 1, 8, 128), lambda b, r, *_: (b, r, 0, 0)),
        ),
    )
    kern = functools.partial(_kernel_b, code=code, nsteps=nsteps, rb=rb)
    new, dec, mins = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((B, nrows, ncols), metrics.dtype),
            jax.ShapeDtypeStruct(
                (B, nsteps, nrows, ncols // 4096, 128), jnp.int32
            ),
            jax.ShapeDtypeStruct((B, ntiles, 8, 128), jnp.int32),
        ),
        grid_spec=grid_spec,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        syms.astype(jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(_colpar_planes(code, nsteps)),
        m3,
    )
    return (
        new.reshape(B, n),
        dec.reshape(B, nsteps, n // 32).astype(jnp.uint32),
        mins[:, :, 0, 0].min(axis=1),
    )


def _check_decision_budget(
    B: int, nbits: int, n: int, copies: int = 2
) -> None:
    """Fail loudly instead of wedging the backend on oversized batches.

    The decision tape costs n/8 bytes per bit per frame (1 MB/bit at
    K=24).  The legacy flat layout's post-scan (ncycles, B, w, …) →
    (nbits, B, …) relayout transiently holds a second copy (copies=2);
    the planes path (update_frame_fused_planes + chainback_planes)
    consumes the scan-native layout directly (copies=1).  At K=24 a
    B=8 1024-bit flat decode wants ~16 GB — beyond a v5e's HBM, which
    is what "wedged" the tunneled backend in round 1 (ROADMAP); on the
    planes path B=8 is ~8.6 GB and fits.  Callers with more frames than
    the budget allows should chunk the batch
    (models/decode.batch_shape_bounded does).
    """
    import os

    budget = int(os.environ.get("ISEE3_FUSED_DEC_BYTES", str(12 * 1024**3)))
    peak = copies * B * nbits * (n // 8)
    if peak > budget:
        raise ValueError(
            f"fused Viterbi decision memory ~{peak / 1e9:.1f} GB "
            f"(B={B}, nbits={nbits}, {n} states) exceeds the "
            f"{budget / 1e9:.1f} GB budget — chunk the batch (e.g. "
            f"B<={max(budget // (copies * nbits * (n // 8)), 1)}) or raise "
            f"ISEE3_FUSED_DEC_BYTES if the device has the HBM"
        )


def _update_frame_planes(
    metrics0: jax.Array,
    syms: jax.Array,
    nbits: int,
    code: CodeSpec,
    ta: int,
    rb: int,
    interpret: bool,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared ACS body: returns decisions in the SCAN-NATIVE layout —
    (ncycles, B, w, n//32) whole-cycle planes plus a (B, rem, n//32)
    remainder — with no relayout copy.  (m, decs4, rem_dec, total)."""
    B, n = metrics0.shape
    w, rowb, colb = _geometry(code)
    if syms.ndim == 1:
        syms = syms[None, :]
    syms = jnp.broadcast_to(
        syms.astype(jnp.int32).reshape(-1, nbits, 2), (B, nbits, 2)
    )
    flat = syms.reshape(B, 2 * nbits)

    ncycles = nbits // w
    rem = nbits - ncycles * w

    def renorm(m, total):
        gmin = m.min(axis=1, keepdims=True).astype(jnp.int32)
        return (
            (m.astype(jnp.int32) - gmin).astype(m.dtype),
            total + gmin[:, 0],
        )

    # Deferred (fused) renormalization: kernel B emits per-tile minima,
    # and the NEXT cycle's kernel A subtracts the resulting global min as
    # it reads — no separate full-array renorm pass.  One cycle of
    # deferral keeps int16 metrics well in range: after subtraction
    # values are <= the path-metric spread (~(K-1)*510), and one cycle
    # adds at most (K-1)*510 more.
    def one_cycle(carry, sym_cycle):
        m, total, base = carry
        sa = sym_cycle[:, : 2 * rowb]
        sb = sym_cycle[:, 2 * rowb :]
        m, deca = cycle_a(m, sa, code, rowb, ta, interpret, base)
        total = total + base
        m, decb, mins = cycle_b(m, sb, code, w - rowb, rb, interpret)
        return (m, total, mins), jnp.concatenate([deca, decb], axis=1)

    total0 = jnp.zeros((B,), jnp.int32)
    base0 = jnp.zeros((B,), jnp.int32)
    if ncycles > 0:
        cyc_syms = flat[:, : 2 * ncycles * w].reshape(B, ncycles, 2 * w)
        cyc_syms = jnp.swapaxes(cyc_syms, 0, 1)  # (ncycles, B, 2w)
        (m, total, base), decs4 = jax.lax.scan(
            one_cycle, (metrics0, total0, base0), cyc_syms
        )
    else:
        m, total, base = metrics0, total0, base0
        decs4 = jnp.zeros((0, B, w, n // 32), jnp.uint32)

    if rem:
        start = 2 * ncycles * w
        na = min(rem, rowb)
        m, deca = cycle_a(
            m, jax.lax.dynamic_slice_in_dim(flat, start, 2 * na, axis=1),
            code, na, ta, interpret, base,
        )
        total = total + base
        parts = [deca]
        if rem > rowb:
            nb = rem - rowb
            m, decb, _ = cycle_b(
                m,
                jax.lax.dynamic_slice_in_dim(
                    flat, start + 2 * rowb, 2 * nb, axis=1
                ),
                code, nb, rb, interpret,
            )
            parts.append(decb)
        m, total = renorm(m, total)
        rem_dec = jnp.concatenate(parts, axis=1)  # (B, rem, n//32)
    else:
        # apply the last pending base so returned metrics are renormed
        m = (m.astype(jnp.int32) - base[:, None]).astype(m.dtype)
        total = total + base
        rem_dec = jnp.zeros((B, 0, n // 32), jnp.uint32)
    return m, decs4, rem_dec, total


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "code", "ta", "rb", "interpret"),
)
def update_frame_fused(
    metrics0: jax.Array,
    syms: jax.Array,
    nbits: int,
    code: CodeSpec = DEFAULT_CODE,
    ta: int = 8192,
    rb: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """nbits ACS steps via fused cycle kernels; same contract as
    viterbi_inplace.update_frame_inplace.

    Emits the FLAT (nbits, B, n//32) decision layout, which costs a
    transient second tape copy in the relayout — streaming callers need
    it for the circular tape.  Frame decodes should prefer
    update_frame_fused_planes + chainback_planes (half the peak HBM).
    """
    B, n = metrics0.shape
    _check_decision_budget(B, nbits, n, copies=2)
    w = code.k - 1
    m, decs4, rem_dec, total = _update_frame_planes(
        metrics0, syms, nbits, code, ta, rb, interpret
    )
    ncycles = nbits // w
    decs = (
        jnp.swapaxes(decs4, 1, 2).reshape(ncycles * w, B, n // 32)
        if ncycles
        else jnp.zeros((0, B, n // 32), jnp.uint32)
    )
    if rem_dec.shape[1]:
        decs = jnp.concatenate(
            [decs, jnp.swapaxes(rem_dec, 0, 1)], axis=0
        )
    return m, decs, total


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "code", "ta", "rb", "interpret"),
)
def update_frame_fused_planes(
    metrics0: jax.Array,
    syms: jax.Array,
    nbits: int,
    code: CodeSpec = DEFAULT_CODE,
    ta: int = 8192,
    rb: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """update_frame_fused without the flat relayout: decisions stay in
    the scan-native (ncycles, B, w, n//32) + (B, rem, n//32) layout that
    chainback_planes consumes directly.  Peak decision memory is ONE
    tape (B·nbits·n/8 bytes) instead of two — B=8 full K=24 frames fit
    a 16 GB v5e (~8.6 GB) where the flat path OOMed."""
    B, n = metrics0.shape
    _check_decision_budget(B, nbits, n, copies=1)
    return _update_frame_planes(metrics0, syms, nbits, code, ta, rb, interpret)


@functools.partial(jax.jit, static_argnames=("nbits", "code"))
def chainback_planes(
    decs4: jax.Array,
    rem_dec: jax.Array,
    nbits: int,
    endstate: int | jax.Array,
    code: CodeSpec = DEFAULT_CODE,
) -> jax.Array:
    """Traceback reading the scan-native decision layout directly.

    decs4: (ncycles, B, w, n//32) whole-cycle planes; rem_dec:
    (B, rem, n//32) tail planes.  Same walk as
    viterbi_inplace.chainback_inplace (plane t is in P_{t+1} layout);
    the plane for step t of a whole cycle is decs4[t//w, :, t%w].
    """
    from isee3_decoder_tpu.ops.viterbi_inplace import _pos_bit

    w = code.k - 1
    k = code.k
    ncycles = decs4.shape[0]
    rem = rem_dec.shape[1]
    assert ncycles * w + rem == nbits
    B = rem_dec.shape[0] if rem else decs4.shape[1]
    s = jnp.broadcast_to(
        jnp.asarray(endstate, jnp.uint32) & code.state_mask, (B,)
    ).astype(jnp.int32)

    desc_bits = []  # bits in descending-t order
    # remainder planes: static t, direct indexing (at most w-1 steps)
    for j in range(rem - 1, -1, -1):
        t = ncycles * w + j
        r = (t + 1) % w
        p = ((s >> r) | (s << (w - r))) & (2**w - 1)
        desc_bits.append((s & 1).astype(jnp.uint8))
        bit = _pos_bit(rem_dec[:, j], p).astype(jnp.int32)
        s = (bit << (k - 2)) | (s >> 1)

    if ncycles:

        nw = decs4.shape[3]

        def step(sstate, t):
            r = jnp.mod(t + 1, w)
            p = ((sstate >> r) | (sstate << (w - r))) & (2**w - 1)
            out_bit = (sstate & 1).astype(jnp.uint8)
            # ONE dynamic_slice pulls exactly the (B, n//32) plane —
            # a two-level index would materialize the whole 23-plane
            # cycle every step (23x the traceback traffic)
            zero = jnp.int32(0)
            plane = jax.lax.dynamic_slice(
                decs4, (t // w, zero, jnp.mod(t, w), zero), (1, B, 1, nw)
            ).reshape(B, nw)
            bit = _pos_bit(plane, p).astype(jnp.int32)
            return (bit << (k - 2)) | (sstate >> 1), out_bit

        ts = jnp.arange(ncycles * w - 1, -1, -1, dtype=jnp.int32)
        s, bits_scan = jax.lax.scan(step, s, ts)  # (ncycles*w, B)
    else:
        bits_scan = jnp.zeros((0, B), jnp.uint8)

    if desc_bits:
        desc = jnp.concatenate([jnp.stack(desc_bits), bits_scan], axis=0)
    else:
        desc = bits_scan
    return jnp.flip(desc.T, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("code", "ta", "rb", "interpret"),
    donate_argnums=(0,),
)
def stream_update_fused(
    state: StreamState,
    syms: jax.Array,
    code: CodeSpec = DEFAULT_CODE,
    ta: int = 8192,
    rb: int = 8,
    interpret: bool = False,
) -> StreamState:
    """Advance a rotating-layout streaming decoder with the fused-cycle
    kernels (the fast path for vdecode-style unbounded streams,
    vdecode.c:142-152 / viterbi224_sse2.c:379-380).

    Cycle/tape alignment contract (so the StreamState invariants
    ``dp == total mod tape_len`` hold and ``stream_decodebits`` works
    unchanged): the chunk must be a multiple of W = K-1 (the metric
    layout returns to P_0 after whole cycles), and the caller must keep
    every write inside the circular tape without straddling the wrap
    (``dp + chunk <= tape_len``; e.g. feed fixed-size chunks that divide
    tape_len, with at most one shorter final chunk).  Callers pad the
    final partial chunk with erasures (128) and pass ``skip`` to
    stream_decodebits.
    """
    w = code.k - 1
    B = state.metrics.shape[0]
    if syms.ndim == 1:
        syms = syms[None, :]
    nbits = syms.shape[-1] // 2
    L = state.decisions.shape[0]
    if nbits % w:
        raise ValueError(f"chunk ({nbits} bits) must be a multiple of W={w}")
    if nbits > L:
        raise ValueError(f"chunk {nbits} exceeds tape_len {L}")
    m, decs, ren = update_frame_fused(
        state.metrics, syms, nbits, code, ta, rb, interpret
    )
    tape = jax.lax.dynamic_update_slice_in_dim(
        state.decisions, decs.astype(jnp.uint32), state.dp, axis=0
    )
    dp = jax.lax.rem(state.dp + nbits, jnp.int32(L))
    return StreamState(
        metrics=m,
        decisions=tape,
        dp=dp,
        total=state.total + nbits,
        renorm=state.renorm + ren,
    )


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "code", "dtype", "ta", "rb", "interpret"),
)
def decode_frame_fused(
    syms: jax.Array,
    nbits: int,
    start_state: int | jax.Array = 0,
    end_state: int | jax.Array = 0,
    code: CodeSpec = DEFAULT_CODE,
    dtype: jnp.dtype = jnp.int16,
    ta: int = 8192,
    rb: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Full frame decode with the fused-cycle kernels.

    Uses the planes (no-relayout) decision path: peak decision memory is
    one tape, so B=8 full K=24 frames fit a 16 GB v5e.
    """
    if syms.ndim == 1:
        syms = syms[None, :]
    B = syms.shape[0]
    n = code.nstates
    start = jnp.broadcast_to(
        jnp.asarray(start_state, jnp.int32) & code.state_mask, (B,)
    )
    metrics = jnp.full((B, n), vit.START_BIAS, dtype)
    metrics = metrics.at[jnp.arange(B), start].set(0)
    _, decs4, rem_dec, _ = update_frame_fused_planes(
        metrics, syms, nbits, code, ta, rb, interpret
    )
    return chainback_planes(decs4, rem_dec, nbits, end_state, code)
