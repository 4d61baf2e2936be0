"""Pallas TPU kernel for the Viterbi ACS trellis step.

The production replacement for ``viterbi224_sse2.c``'s 8-lane SSE inner
loop (sse2.c:277-328): one trellis step over all 2**(K-2) butterflies,
tiled along the state dimension so metric tiles stream HBM→VMEM→HBM
while the VPU does the add-compare-select.

Design:
* int16 metrics (like the SSE2 kernel) — the ACS is HBM-bandwidth-bound
  (33 MB of metric traffic per decoded bit at K=24), so precision is
  traffic.
* Renormalization is folded into the branch metric: the caller passes
  the previous step's global minimum (computed from per-tile minima this
  kernel also emits) and the kernel subtracts it while adding branch
  metrics — zero extra passes over HBM, decisions invariant.
* Decisions are packed to uint32 words inside the kernel (bit (2i)%32 of
  word (2i)/32 == decision_t layout), 1 MB per step at K=24.
* Grid iterates (batch, state-tiles); each kernel instance reads the two
  old-metric half-tiles (states i and i+2**(K-2)) and writes one
  contiguous interleaved new-state tile.
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

LANES = 128


def _acs_kernel(syms_ref, adjust_ref, lo_ref, hi_ref, b0_ref, b1_ref,
                new_ref, dec_ref, tmin_ref):
    """One butterfly tile of one trellis step.

    syms/adjust: scalar-prefetch SMEM refs, indexed by the batch grid
           coordinate.
    lo/hi: (1, R, LANES) int16 old metrics for butterflies i and
           i+2**(K-2) — flat butterfly index = row*LANES + lane.
    b0/b1: (R, LANES) int8 branch bits.
    new:   (1, 2R, LANES) int16 interleaved new metrics.
    dec:   (1, R//16, LANES) uint32 packed decisions, canonical
           decision_t layout (bit state&31 of word state>>5).
    tmin:  (1, 8, NTILES) int32 VMEM accumulator revisited by every tile
           of a batch row; element (0, t) holds tile t's minimum.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    s0 = syms_ref[b, 0].astype(jnp.int32)
    s1 = syms_ref[b, 1].astype(jnp.int32)
    adjust = adjust_ref[b]

    b0 = b0_ref[:].astype(jnp.int32)
    b1 = b1_ref[:].astype(jnp.int32)
    metric32 = (s0 + b0 * (255 - 2 * s0)) + (s1 + b1 * (255 - 2 * s1)) - adjust
    metric = metric32.astype(jnp.int16)
    m_metric = (510 - metric32 - 2 * adjust).astype(jnp.int16)

    lo = lo_ref[0]
    hi = hi_ref[0]
    m0 = lo + metric
    m3 = hi + metric
    m1 = hi + m_metric
    m2 = lo + m_metric

    d0 = m0 > m1
    d1 = m2 > m3
    s0v = jnp.minimum(m0, m1)
    s1v = jnp.minimum(m2, m3)

    R = lo.shape[0]
    # New state 2i ← s0v[i], 2i+1 ← s1v[i].  Flat new-state index
    # = 2*(row*LANES + lane) + d: interleave along the *lane* axis of
    # each row pair: new rows (2r, 2r+1) hold lanes
    # [s0v[r,0], s1v[r,0], s0v[r,1], ...] split across two rows.
    pair = jnp.stack([s0v, s1v], axis=-1).reshape(R, 2 * LANES)
    new_ref[0] = pair.reshape(2 * R, LANES)

    # Decisions, canonical layout: bit (s & 31) of word (s >> 5).  The
    # interleaved decision row pair (2*LANES bits) forms 8 words.
    # Sum in int32 (Mosaic lacks unsigned reductions); two's-complement
    # wraparound keeps the packed bits identical, then reinterpret.
    dd = jnp.stack([d0, d1], axis=-1).reshape(R, 2 * LANES).astype(jnp.int32)
    dd = dd.reshape(R, 8, 32)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (R, 8, 32), 2)
    words = (dd << shifts).sum(axis=2, dtype=jnp.int32)  # (R, 8)
    dec_ref[0] = words.reshape(R // 16, LANES).astype(jnp.uint32)

    ntiles = tmin_ref.shape[2]
    # Mosaic reduces in int32 only; widen the survivor minima first.
    val = jnp.minimum(
        s0v.astype(jnp.int32).min(), s1v.astype(jnp.int32).min()
    )

    @pl.when(t == 0)
    def _():
        tmin_ref[0] = jnp.full((8, ntiles), jnp.int32(2**31 - 1))

    cur = tmin_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (8, ntiles), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, ntiles), 0)
    tmin_ref[0] = jnp.where((col == t) & (row == 0), val, cur)


@functools.partial(jax.jit, static_argnames=("code", "tile_rows", "interpret"))
def acs_step_pallas(
    metrics: jax.Array,
    syms: jax.Array,
    adjust: jax.Array,
    code: CodeSpec = DEFAULT_CODE,
    tile_rows: int = 4096,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One trellis step for a whole batch.

    Args:
      metrics: (B, nstates) int16 old path metrics (standard state order).
      syms: (B, 2) int32 soft symbol pair.
      adjust: (B,) int32 value to subtract this step (previous global min).

    Returns (new_metrics (B, nstates) int16,
             packed decisions (B, nstates//32) uint32,
             global_min (B,) int32).
    """
    B, nstates = metrics.shape
    half = nstates // 2
    rows_half = half // LANES  # butterfly rows
    R = min(tile_rows, rows_half)
    assert rows_half % R == 0 and R % 16 == 0
    ntiles = rows_half // R

    b0_np, b1_np = vit.branch_bits(code)
    b0 = jnp.asarray(b0_np.reshape(rows_half, LANES), jnp.int8)
    b1 = jnp.asarray(b1_np.reshape(rows_half, LANES), jnp.int8)

    m3 = metrics.reshape(B, 2 * rows_half, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, ntiles),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda b, t, *_: (b, t, 0)),
            pl.BlockSpec((1, R, LANES), lambda b, t, *_: (b, ntiles + t, 0)),
            pl.BlockSpec((R, LANES), lambda b, t, *_: (t, 0)),
            pl.BlockSpec((R, LANES), lambda b, t, *_: (t, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 2 * R, LANES), lambda b, t, *_: (b, t, 0)),
            pl.BlockSpec((1, R // 16, LANES), lambda b, t, *_: (b, t, 0)),
            pl.BlockSpec((1, 8, ntiles), lambda b, t, *_: (b, 0, 0)),
        ),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, 2 * rows_half, LANES), jnp.int16),
        jax.ShapeDtypeStruct((B, rows_half // 16, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((B, 8, ntiles), jnp.int32),
    )
    new, dec, tmins = pl.pallas_call(
        _acs_kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(syms.astype(jnp.int32), adjust.astype(jnp.int32), m3, m3, b0, b1)
    return (
        new.reshape(B, nstates),
        dec.reshape(B, nstates // 32),
        tmins[:, 0, :].min(axis=1),
    )


@functools.partial(jax.jit, static_argnames=("code", "tile_rows", "interpret"), donate_argnums=(0,))
def update_blk_pallas(
    state: vit.ViterbiState,
    syms: jax.Array,
    code: CodeSpec = DEFAULT_CODE,
    tile_rows: int = 4096,
    interpret: bool = False,
) -> vit.ViterbiState:
    """Pallas-backed update_viterbi224_blk: scan acs_step_pallas over the
    symbol pairs, writing packed decisions into the circular tape."""
    if syms.ndim == 1:
        syms = syms[None, :]
    B = state.metrics.shape[0]
    nbits = syms.shape[-1] // 2
    syms = jnp.broadcast_to(
        syms.astype(jnp.int32).reshape(-1, nbits, 2), (B, nbits, 2)
    )
    syms = jnp.swapaxes(syms, 0, 1)
    tape_len = state.tape_len

    def step(carry, sym_t):
        metrics, tape, dp, renorm, adjust = carry
        new, packed, gmin = acs_step_pallas(metrics, sym_t, adjust, code, tile_rows, interpret)
        tape = jax.lax.dynamic_update_index_in_dim(tape, packed, dp, axis=0)
        dp = jax.lax.rem(dp + 1, jnp.int32(tape_len))
        return (new, tape, dp, renorm + adjust, gmin), None

    adjust0 = jnp.zeros((B,), jnp.int32)
    (metrics, tape, dp, renorm, last_min), _ = jax.lax.scan(
        step,
        (state.metrics, state.decisions, state.dp, state.renorm, adjust0),
        syms,
    )
    # Apply the final pending adjustment so stored metrics are normalized
    metrics = metrics - last_min[:, None].astype(metrics.dtype)
    return vit.ViterbiState(
        metrics=metrics, decisions=tape, dp=dp, renorm=renorm + last_min
    )


@functools.partial(jax.jit, static_argnames=("nbits", "code", "tile_rows", "interpret"))
def decode_frame_pallas(
    syms: jax.Array,
    nbits: int,
    start_state: int | jax.Array = 0,
    end_state: int | jax.Array = 0,
    code: CodeSpec = DEFAULT_CODE,
    tile_rows: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Full frame decode with the Pallas ACS kernel."""
    if syms.ndim == 1:
        syms = syms[None, :]
    st = vit.create(nbits, syms.shape[0], code, start_state, jnp.int16)
    st = update_blk_pallas(st, syms, code, tile_rows, interpret)
    return vit.chainback(st, nbits, end_state, code)
