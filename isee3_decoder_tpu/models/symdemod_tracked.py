"""Device-batched clock/phase tracking (-t) for many channels at once.

VERDICT r4 next #6: ``symdemod_tracked`` runs the reference's
single-channel hill climb (symdemod.c:133-174) per channel on the host —
faithful, golden byte-exact at B=1, but a 128-channel tracked run costs
~128x one channel (and each distinct float clock value recompiles the
integrator).  This module batches the tracker across channels with ONE
jitted device program per window.

Design — the quantized clock grid: every channel's clock estimate lives
on the integer grid ``ss_k = ss0 + k * incr0`` where ``incr0`` is the
reference's hill-climb step at the nominal clock (0.5 * ss0 / window
samples).  All edge tables (the f64 cumsum + nearbyint split of
ops/symbols.trial_edges / search_edges — the exact convention of the
host path) are then precomputed on the host for every k and shipped
once; the per-window program gathers each channel's table row by its
``k`` register, so the clock is DATA, not a compile-time constant:

  * window-start timing search (symdemod.c timesearch, relative integer
    switchpoints) over all offsets — per-offset integer integrals come
    from contiguous csum slices around each switchpoint, so the whole
    sweep is one sliced gather + elementwise work;
  * the hill climb as a ``lax.while_loop`` over per-channel state
    machines (probe order ss+d, ss-d, first+p, first-p with sign flips
    and the two-pass no-change exit — symdemod.c:133-174), one proposal
    evaluation per iteration for every non-converged channel;
  * the final absolute-rounded integrate-and-dump + gain scaling
    (trial_demod, symdemod.c:202-256).

Deviation from the reference (documented, B>1 only): the C recomputes
its clock step from the CURRENT estimate each window (incr = 0.5*ss/W),
so its step size drifts by |k|*incr0/ss0 (< 0.1% over the +/-0.25-sample
grid span); the grid holds the step at incr0.  B=1 keeps the host
tracker (models/symdemod.symdemod_tracked), which stays golden
byte-exact vs the compiled C ``symdemod -t``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.ops import symbols as sym_ops
from isee3_decoder_tpu.ops.reductions import argmax_first
from isee3_decoder_tpu.ops.symbols import SymConfig


class TrackTables(NamedTuple):
    """Host-precomputed per-k edge tables (see module docstring)."""

    flo: np.ndarray  # (2K, E) int32   floor(trial edge)
    up: np.ndarray  # (2K, E) int8    frac > .5
    tie: np.ndarray  # (2K, E) int8    frac == .5 (half-to-even w/ parity)
    srch: np.ndarray  # (2K, E) int32   rint relative switchpoints
    nsym: np.ndarray  # (2K,)   int32   int(window*fs / ss_k)
    ss: np.ndarray  # (2K,)   float64 ss_k (host bookkeeping)
    k_range: int
    nsym_max: int
    noff: int


@functools.lru_cache(maxsize=4)
def build_track_tables(cfg: SymConfig, k_range: int = 512) -> TrackTables:
    ss0 = cfg.symbolsamples
    incr0 = 0.5 * ss0 / (cfg.window * cfg.samprate)
    # Build the grid by the SAME sequential accumulation the host/C
    # tracker performs (symdemod.c: Symbolsamples += clock_incr per
    # accepted probe): a monotone climb of |k| steps then lands on a
    # bitwise-identical float64 clock, so the nearbyint edge tables
    # match the host's exactly.  ss0 + k*incr0 in one multiply is ~1 ulp
    # off, which flips exact-.5 rounding ties (1-byte soft divergences
    # seen at clock values like 80.02).
    ss = np.empty(2 * k_range, np.float64)
    ss[k_range] = ss0
    for i in range(k_range + 1, 2 * k_range):
        ss[i] = ss[i - 1] + incr0
    for i in range(k_range - 1, -1, -1):
        ss[i] = ss[i + 1] - incr0
    nsym = (cfg.window * cfg.samprate / ss).astype(np.int64)
    nsym_max = int(nsym.max())
    c = cfg.symbolclocks
    E = 2 * c * nsym_max + 1
    flo = np.empty((2 * k_range, E), np.int32)
    up = np.empty((2 * k_range, E), np.int8)
    tie = np.empty((2 * k_range, E), np.int8)
    srch = np.empty((2 * k_range, E), np.int32)
    for i, s in enumerate(ss):
        half = (0.5 / c) * s
        rel = sym_ops.trial_edges(half, nsym_max, c)  # exact f64 cumsum
        f = np.floor(rel)
        frac = rel - f
        flo[i] = f.astype(np.int32)
        up[i] = (frac > 0.5).astype(np.int8)
        tie[i] = (frac == 0.5).astype(np.int8)
        srch[i] = sym_ops.search_edges(half, nsym_max, c).astype(np.int32)
    noff = int(ss0 / 2) + math.ceil(ss0 / 2)
    return TrackTables(
        flo=flo, up=up, tie=tie, srch=srch,
        nsym=nsym.astype(np.int32), ss=ss,
        k_range=k_range, nsym_max=nsym_max, noff=noff,
    )


def _ffloat():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@functools.partial(
    jax.jit, static_argnames=("nsym_max", "noff", "symbolclocks", "k_range")
)
def _tracked_window_device(
    csum: jax.Array,  # (B, L) int32 prefix sum
    first: jax.Array,  # (B,) int32
    k: jax.Array,  # (B,) int32 grid index (signed, in [-K, K))
    flo: jax.Array,
    up: jax.Array,
    tie: jax.Array,
    srch: jax.Array,
    nsym_t: jax.Array,  # (2K,) int32
    nsym_max: int,
    noff: int,
    symbolclocks: int,
    k_range: int,
):
    """One tracked window for every channel: timesearch + hill climb +
    final demod.  Returns (soft (B, nsym_max) u8, nsym (B,), first',
    k', symphase, maxenergy)."""
    B = csum.shape[0]
    c = symbolclocks
    ff = _ffloat()
    sym_j = jnp.arange(nsym_max, dtype=jnp.int32)[None, :]

    def row(tbl, kk):
        return tbl[kk + k_range]  # (B, E)

    def trial_integ(kk, fs):
        """Absolute-rounded integrate-and-dump at grid clock kk from
        sample fs (trial_demod semantics via the per-k tables)."""
        f = row(flo, kk).astype(jnp.int32)
        base = fs[:, None] + f
        edges = base + row(up, kk) + row(tie, kk) * (base & 1)
        g = jnp.take_along_axis(csum, edges, axis=-1)
        seg = (g[:, 1:] - g[:, :-1]).reshape(B, nsym_max, c, 2)
        return (seg[..., 1] - seg[..., 0]).sum(axis=-1, dtype=csum.dtype)

    def masked_energy(integ, kk):
        n = nsym_t[kk + k_range]
        valid = sym_j < n[:, None]
        sq = jnp.where(valid, integ.astype(ff) ** 2, 0.0)
        return sq.sum(axis=-1) / n.astype(ff)

    # ---------- window-start timing search (relative rounding) ----------
    off0 = -(noff // 2)
    rel = row(srch, k)  # (B, E) int32
    base = first[:, None] + off0 + rel

    def slices(crow, brow):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(crow, (s,), (noff,))
        )(brow)

    V = jax.vmap(slices)(csum, base)  # (B, E, noff) int32
    D = V[:, 1:] - V[:, :-1]
    I = (
        D.reshape(B, nsym_max, c, 2, noff)[..., 1, :]
        - D.reshape(B, nsym_max, c, 2, noff)[..., 0, :]
    ).sum(axis=2)  # (B, nsym_max, noff) int32
    n_b = nsym_t[k + k_range]
    valid = (sym_j < n_b[:, None])[..., None]
    energy_o = jnp.where(valid, I.astype(ff) ** 2, 0.0).sum(axis=1) / (
        n_b[:, None].astype(ff)
    )  # (B, noff)
    best = argmax_first(energy_o, axis=-1)
    symphase = (off0 + best).astype(jnp.int32)
    first = first + symphase
    maxe = jnp.take_along_axis(energy_o, best[:, None], axis=-1)[:, 0]

    # ---------- hill climb (symdemod.c:133-174 state machine) ----------
    class HC(NamedTuple):
        k: jax.Array
        first: jax.Array
        dir: jax.Array
        pi: jax.Array
        phase: jax.Array  # 0..3: which proposal is next
        fails: jax.Array  # consecutive fails within the current pass
        done: jax.Array
        maxe: jax.Array

    init = HC(
        k=k,
        first=first,
        dir=jnp.ones((B,), jnp.int32),
        pi=jnp.ones((B,), jnp.int32),
        phase=jnp.zeros((B,), jnp.int32),
        fails=jnp.zeros((B,), jnp.int32),
        done=jnp.zeros((B,), bool),
        maxe=maxe,
    )

    def cond(h: HC):
        return ~jnp.all(h.done)

    def body(h: HC) -> HC:
        clock_probe = h.phase < 2
        sign = jnp.where((h.phase & 1) == 0, 1, -1)
        k_prop = jnp.clip(
            jnp.where(clock_probe, h.k + sign * h.dir, h.k),
            -k_range, k_range - 1,
        )
        f_prop = jnp.where(clock_probe, h.first, h.first + sign * h.pi)
        e = masked_energy(trial_integ(k_prop, f_prop), k_prop)
        accept = ~h.done & (e > h.maxe)
        # B-proposal accepts flip the probe direction (ci = -ci / pi = -pi)
        flip = accept & (h.phase == 1)
        flip_p = accept & (h.phase == 3)
        k_next = jnp.where(accept & clock_probe, k_prop, h.k)
        f_next = jnp.where(accept & ~clock_probe, f_prop, h.first)
        dir_next = jnp.where(flip, -h.dir, h.dir)
        pi_next = jnp.where(flip_p, -h.pi, h.pi)
        maxe_next = jnp.where(accept, e, h.maxe)
        phase_next = jnp.where(accept, 0, (h.phase + 1) % 4)
        fails_next = jnp.where(accept, 0, h.fails + 1)
        # a full 4-fail pass ends the climb (the C nochange<2 exit)
        done_next = h.done | (~h.done & (h.phase == 3) & (fails_next >= 4))
        fails_next = jnp.where(h.phase == 3, 0, fails_next)
        return HC(
            k=k_next, first=f_next, dir=dir_next, pi=pi_next,
            phase=jnp.where(h.done, h.phase, phase_next),
            fails=jnp.where(h.done, h.fails, fails_next),
            done=done_next,
            maxe=maxe_next,
        )

    hc = jax.lax.while_loop(cond, body, init)

    # ---------- final demod (trial_demod with gain) ----------
    integ = trial_integ(hc.k, hc.first)
    n_f = nsym_t[hc.k + k_range]
    gain = 100.0 / jnp.sqrt(hc.maxe)
    soft, _ = sym_ops.finish_demod(integ, gain)
    soft = jnp.where(sym_j < n_f[:, None], soft, 128).astype(jnp.uint8)
    return soft, n_f, hc.first, hc.k, symphase, hc.maxe


def symdemod_tracked_batched(
    samples: np.ndarray,
    cfg: SymConfig,
    nwindows: int,
    k_range: int = 512,
) -> tuple[np.ndarray, list[dict]]:
    """Batched -t demodulation: all channels tracked concurrently, one
    device program per window (module docstring).

    Returns (soft (B, total) uint8 — rows right-padded with 128, and
    per-window info dicts whose array fields stack the channels),
    mirroring models/symdemod.symdemod_tracked.
    """
    samples = jnp.asarray(samples)
    if samples.ndim == 1:
        samples = samples[None, :]
    B = samples.shape[0]
    t = build_track_tables(cfg, k_range)
    pad = (
        16 * int(cfg.symbolsamples) + sym_ops.TRACK_DELTA + t.noff + 576
    )
    csum = sym_ops.prefix_sum(samples, pad_to=samples.shape[1] + pad)
    flo_d = jnp.asarray(t.flo)
    up_d = jnp.asarray(t.up, jnp.int32)
    tie_d = jnp.asarray(t.tie, jnp.int32)
    srch_d = jnp.asarray(t.srch)
    nsym_d = jnp.asarray(t.nsym)

    from isee3_decoder_tpu.models.symdemod import initial_firstsample

    first = np.full((B,), initial_firstsample(cfg), np.int64)
    k = np.zeros((B,), np.int32)
    streams = [[] for _ in range(B)]
    infos = []
    for w in range(nwindows):
        soft, n_f, first_d, k_d, symphase, maxe = _tracked_window_device(
            csum, jnp.asarray(first, jnp.int32), jnp.asarray(k),
            flo_d, up_d, tie_d, srch_d, nsym_d,
            t.nsym_max, t.noff, cfg.symbolclocks, t.k_range,
        )
        soft = np.asarray(soft)
        n_f = np.asarray(n_f)
        first = np.asarray(first_d, np.int64)
        k = np.asarray(k_d)
        for b in range(B):
            streams[b].append(soft[b, : n_f[b]])
        infos.append(
            dict(
                window=w,
                symbolsamples=t.ss[k + t.k_range].copy(),
                symrate=cfg.samprate / t.ss[k + t.k_range],
                firstsample=first.copy(),
                energy=np.asarray(maxe).copy(),
                symphase=np.asarray(symphase).copy(),
            )
        )
        # advance to the next window (C truncation, f64 — symdemod.c)
        first = np.trunc(
            first.astype(np.float64) + n_f * t.ss[k + t.k_range]
        ).astype(np.int64)

    rows = [np.concatenate(s) for s in streams]
    total = max(r.size for r in rows)
    out = np.full((B, total), 128, np.uint8)
    for b, r in enumerate(rows):
        out[b, : r.size] = r
    return out, infos
