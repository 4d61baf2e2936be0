"""State-dimension-sharded Viterbi ACS over a device mesh.

The 2**(K-1)-state lattice (16 MB of int16/int32 metrics at K=24) is
sharded across the ``state`` mesh axis; each trellis step's butterfly
exchange becomes a *perfect-shuffle* permutation of metric half-blocks
over ICI (SURVEY.md §2.5: "state-dim sharding of the 2^23-state lattice
across cores with exchange of boundary metrics").

Derivation: with S devices and new-state blocks B_p = [pM, (p+1)M)
(M = 2**(K-1)/S), device p consumes old states i and i + 2**(K-2) for
i in [pM/2, (p+1)M/2).  As *new-state* indices those ranges live on
devices floor(p/2) and S/2 + floor(p/2) — and each device's block splits
into exactly two half-blocks each destined for one device.  The exchange
is therefore 4 ``ppermute`` calls of M/2 metrics per step (a de Bruijn
graph shuffle), riding ICI neighbor links.

Decisions stay sharded with the new-state blocks; chainback gathers one
bit per step (tiny traffic) and runs under normal jit auto-sharding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isee3_decoder_tpu.config import DEFAULT_CODE, CodeSpec
from isee3_decoder_tpu.ops import viterbi as vit


def _shuffle_perms(S: int) -> tuple[list, list, list, list]:
    """The four half-block permutations (see module docstring)."""
    p1 = [(q, 2 * q) for q in range(S // 2)]
    p2 = [(q, 2 * q + 1) for q in range(S // 2)]
    p3 = [(q + S // 2, 2 * q) for q in range(S // 2)]
    p4 = [(q + S // 2, 2 * q + 1) for q in range(S // 2)]
    return p1, p2, p3, p4


@functools.partial(
    jax.jit, static_argnames=("mesh", "nbits", "code", "batch_axis", "state_axis")
)
def update_blk_sharded(
    metrics: jax.Array,
    syms: jax.Array,
    mesh: Mesh,
    nbits: int,
    code: CodeSpec = DEFAULT_CODE,
    batch_axis: str = "ch",
    state_axis: str = "state",
) -> tuple[jax.Array, jax.Array]:
    """Run nbits ACS steps with metrics sharded over the state axis and
    frames sharded over the batch axis.

    Args:
      metrics: (B, 2**(K-1)) int32 path metrics.
      syms: (B, 2*nbits) uint8 soft symbols.

    Returns (new_metrics, decisions) with decisions (nbits, B, words)
    uint32, sharded like the metrics.
    """
    S = mesh.shape[state_axis]
    nstates = code.nstates
    assert nstates % (2 * S) == 0
    M = nstates // S
    b0_np, b1_np = vit.branch_bits(code)
    b0 = jnp.asarray(b0_np, jnp.int32)
    b1 = jnp.asarray(b1_np, jnp.int32)
    perms = _shuffle_perms(S) if S > 1 else None

    def local_step(metrics_blk, sym_t, b0_blk, b1_blk):
        """One ACS step on this device's butterfly slice.

        metrics_blk: (B, M) — this device's OLD metrics for its own
        butterflies, already arranged as [low_half (M/2), high_half (M/2)].
        """
        Bl = metrics_blk.shape[0]
        low = metrics_blk[:, : M // 2]
        high = metrics_blk[:, M // 2 :]
        s0 = sym_t[:, 0:1]
        s1 = sym_t[:, 1:2]
        metric = (s0 + b0_blk * (255 - 2 * s0)) + (s1 + b1_blk * (255 - 2 * s1))
        m_metric = 510 - metric
        m0 = low + metric
        m3 = high + metric
        m1 = high + m_metric
        m2 = low + m_metric
        d0 = m0 > m1
        d1 = m2 > m3
        s0v = jnp.minimum(m0, m1)
        s1v = jnp.minimum(m2, m3)
        new = jnp.stack([s0v, s1v], axis=-1).reshape(Bl, M)
        dec = jnp.stack([d0, d1], axis=-1).reshape(Bl, M)
        packed = (
            dec.reshape(Bl, M // 32, 32).astype(jnp.uint32)
            << jnp.arange(32, dtype=jnp.uint32)
        ).sum(axis=-1, dtype=jnp.uint32)
        return new, packed

    def shard_fn(metrics_l, syms_l):
        # metrics_l: (B_local, M); syms_l: (B_local, nbits, 2)
        p = jax.lax.axis_index(state_axis)
        # This device's butterfly slice: i in [p*M/2, (p+1)*M/2)
        b0_blk = jax.lax.dynamic_slice_in_dim(b0, p * (M // 2), M // 2)
        b1_blk = jax.lax.dynamic_slice_in_dim(b1, p * (M // 2), M // 2)

        def exchange(new_blk):
            """new-state metrics block → next step's (low, high) inputs."""
            if perms is None:
                half = new_blk.shape[1] // 2
                return new_blk  # S == 1: already [low, high] of own range
            h0 = new_blk[:, : M // 2]
            h1 = new_blk[:, M // 2 :]
            p1, p2, p3, p4 = perms
            low_even = jax.lax.ppermute(h0, state_axis, p1)
            low_odd = jax.lax.ppermute(h1, state_axis, p2)
            high_even = jax.lax.ppermute(h0, state_axis, p3)
            high_odd = jax.lax.ppermute(h1, state_axis, p4)
            parity = p % 2
            low = jnp.where(parity == 0, low_even, low_odd)
            high = jnp.where(parity == 0, high_even, high_odd)
            return jnp.concatenate([low, high], axis=1)

        def step(carry, sym_t):
            inputs = carry
            new, packed = local_step(inputs, sym_t, b0_blk, b1_blk)
            new = new - jax.lax.pmin(new.min(axis=1, keepdims=True), state_axis)
            return exchange(new), (new, packed)

        syms_t = jnp.swapaxes(syms_l, 0, 1)  # (nbits, B, 2)
        final_inputs, (news, decs) = jax.lax.scan(step, exchange_init(metrics_l, p), syms_t)
        return news[-1], decs

    def exchange_init(metrics_l, p):
        """Initial arrangement: device p holds new-state block B_p of the
        *initial* metrics; convert to its butterfly inputs the same way."""
        if perms is None:
            return metrics_l
        h0 = metrics_l[:, : M // 2]
        h1 = metrics_l[:, M // 2 :]
        p1, p2, p3, p4 = perms
        low_even = jax.lax.ppermute(h0, state_axis, p1)
        low_odd = jax.lax.ppermute(h1, state_axis, p2)
        high_even = jax.lax.ppermute(h0, state_axis, p3)
        high_odd = jax.lax.ppermute(h1, state_axis, p4)
        parity = p % 2
        low = jnp.where(parity == 0, low_even, low_odd)
        high = jnp.where(parity == 0, high_even, high_odd)
        return jnp.concatenate([low, high], axis=1)

    from jax import shard_map

    syms3 = syms.astype(jnp.int32).reshape(syms.shape[0], nbits, 2)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(batch_axis, state_axis), P(batch_axis, None, None)),
        out_specs=(P(batch_axis, state_axis), P(None, batch_axis, state_axis)),
        check_vma=False,
    )
    return fn(metrics, syms3)


def decode_frame_sharded(
    syms: jax.Array,
    mesh: Mesh,
    nbits: int,
    start_state: int = 0,
    end_state: int = 0,
    code: CodeSpec = DEFAULT_CODE,
) -> jax.Array:
    """Full sharded frame decode: init → sharded ACS → chainback.

    Output matches ops.viterbi.decode_frame bit-for-bit.
    """
    if syms.ndim == 1:
        syms = syms[None, :]
    B = syms.shape[0]
    nstates = code.nstates
    start = jnp.full((B,), start_state & code.state_mask, jnp.int32)
    metrics = jnp.full((B, nstates), vit.START_BIAS, jnp.int32)
    metrics = metrics.at[jnp.arange(B), start].set(0)
    metrics = jax.device_put(
        metrics, NamedSharding(mesh, P("ch", "state"))
    )
    new_metrics, decisions = update_blk_sharded(metrics, syms, mesh, nbits, code)
    state = vit.ViterbiState(
        metrics=new_metrics,
        decisions=decisions,
        dp=jnp.zeros((), jnp.int32),
        renorm=jnp.zeros((B,), jnp.int32),
    )
    return vit.chainback(state, nbits, end_state, code)
