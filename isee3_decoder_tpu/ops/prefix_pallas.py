"""Fused Pallas prefix-sum kernels for the symdemod front-end.

The symbol demodulator consumes an exclusive int32 prefix sum of the
(B, L) int16 baseband (ops/symbols.py).  Built from jnp primitives that
takes two full HBM passes at bench shapes (int16→int32 cumsum write +
re-read), *plus* a third relayout pass when the baseband arrives in the
pm scan's natural (T, B, n) block layout and must first be transposed to
(B, T·n).  This kernel does all of it in ONE streaming pass: each grid
step reads one (Bt, n) int16 tile straight out of the scan-layout array,
computes its cumulative sum hierarchically on the VPU (lane rolls), adds
the running per-channel carry from VMEM scratch, and writes the exclusive
int32 tile to the (B, L) output — HBM traffic is exactly read-int16 +
write-int32, the speed-of-light for this op.

Output convention: exclusive prefix sum of length L (out[b, k] =
sum(x[b, :k]), k < L).  This matches ops/symbols.prefix_sum minus its
final total column; callers must leave ≥1 sample of slack after the last
edge they read (the receive chain always does — see
models/pipeline.demod_to_symbols).

Reference behavior being accelerated: the per-sample integrate-and-dump
accumulation of symdemod.c:226-239, recast as prefix-sum differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 8  # channel rows per tile (int32 sublane tile)


def _tile_cumsum(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(Bt, n) int32 → (inclusive cumsum along axis 1, (Bt, 1) totals).

    Hierarchical: 7 masked lane roll-adds give each 128-lane group its
    cumsum; group totals then scan with masked roll-adds along the
    second-minor axis; finally the exclusive group offsets broadcast
    back over lanes.
    """
    bt, n = x.shape
    g = n // 128
    x3 = x.reshape(bt, g, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, g, 128), 2)
    for d in (1, 2, 4, 8, 16, 32, 64):
        x3 = x3 + jnp.where(lane >= d, jnp.roll(x3, d, axis=2), 0)
    gs = x3[:, :, 127:128]  # (bt, g, 1) group totals
    gi = jax.lax.broadcasted_iota(jnp.int32, (bt, g, 1), 1)
    acc = gs
    d = 1
    while d < g:
        acc = acc + jnp.where(gi >= d, jnp.roll(acc, d, axis=1), 0)
        d *= 2
    # exclusive group offsets; inclusive total of the whole tile
    x3 = x3 + (acc - gs)
    total = acc[:, g - 1 :, 0]  # (bt, 1)
    return x3.reshape(bt, n), total


def _kernel(in_ref, out_ref, carry, *, from_blocks: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    x = in_ref[0] if from_blocks else in_ref[...]
    x = x.astype(jnp.int32)
    inc, total = _tile_cumsum(x)
    out_ref[...] = inc - x + carry[...]  # exclusive + running carry
    carry[...] = carry[...] + total


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefix_sum_blocks(blocks: jax.Array, interpret: bool = False) -> jax.Array:
    """(T, B, n) int16 scan-layout baseband → (B, T·n) int32 exclusive
    prefix sum, one HBM pass (transpose fused in).

    Requires B % 8 == 0 and n % 128 == 0 (the production shapes); use
    ops.symbols.prefix_sum otherwise.
    """
    T, B, n = blocks.shape
    assert B % _BT == 0 and n % 128 == 0, (B, n)
    grid = (B // _BT, T)
    return pl.pallas_call(
        functools.partial(_kernel, from_blocks=True),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BT, n), lambda bi, j: (j, bi, 0)),
        ],
        out_specs=pl.BlockSpec((_BT, n), lambda bi, j: (bi, j)),
        out_shape=jax.ShapeDtypeStruct((B, T * n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_BT, 1), jnp.int32)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(blocks)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def prefix_sum_flat(
    samples: jax.Array, tile: int = 65536, interpret: bool = False
) -> jax.Array:
    """(B, L) int16 → (B, L) int32 exclusive prefix sum, one HBM pass.

    Requires B % 8 == 0 and L % tile == 0.
    """
    B, L = samples.shape
    while L % tile != 0:
        tile //= 2
    assert B % _BT == 0 and tile % 128 == 0 and L % tile == 0, (B, L, tile)
    grid = (B // _BT, L // tile)
    return pl.pallas_call(
        functools.partial(_kernel, from_blocks=False),
        grid=grid,
        in_specs=[pl.BlockSpec((_BT, tile), lambda bi, j: (bi, j))],
        out_specs=pl.BlockSpec((_BT, tile), lambda bi, j: (bi, j)),
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((_BT, 1), jnp.int32)],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(samples)


def supports(B: int, n: int) -> bool:
    return B % _BT == 0 and n % 128 == 0
