"""decode stage model: frame sync + hybrid Fano/Viterbi decoding.

Capability parity with ``decode.c:42-289``: a per-channel lock state
machine — when unlocked, a 34-symbol soft sync correlation over a full
frame of positions finds the frame boundary; each frame is then tried
with the Fano decoder, falling back to Viterbi exactly under the
reference policy (decode.c:209-214):

  Viterbi runs iff it is enabled AND (Fano is disabled OR (Fano failed
  AND (the previous frame decoded OR -p persistent))).

A frame is accepted (lock=1) iff its last 5 decoded bytes equal the
syncword (decode.c:237-247).

TPU-native design: the decoder runs *batched across channels* — one Fano
call decodes every channel's frame in lockstep, and the (rare, expensive)
Viterbi fallback runs on just the subset of channels that need it.  The
stream walk itself is host-driven (frame boundaries are data-dependent),
but every kernel invoked is jitted device code.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isee3_decoder_tpu.config import (
    DEFAULT_CODE,
    FRAMEBITS,
    FRAMESYMBOLS,
    SYNCBITS,
    SYNCWORD,
    SYNC_STATE,
    CodeSpec,
)
from isee3_decoder_tpu.ops import viterbi
from isee3_decoder_tpu.ops.encode import bits_to_bytes
from isee3_decoder_tpu.ops.fano import FanoParams, fano_decode
from isee3_decoder_tpu.ops.syncword import find_sync, verify_frame
from isee3_decoder_tpu.utils.metrics import decoder_amplitudes, gen_met

DECODER_NONE, DECODER_VITERBI, DECODER_FANO = 0, 1, 2


def _viterbi_decode(fsyms, cfg: "DecodeConfig"):
    """Dispatch the frame decode to the configured Viterbi kernel."""
    if cfg.viterbi_backend == "fused":
        from isee3_decoder_tpu.ops.viterbi_pallas_fused import decode_frame_fused

        return decode_frame_fused(
            fsyms, FRAMEBITS, SYNC_STATE, SYNC_STATE, cfg.code
        )
    if cfg.viterbi_backend == "inplace":
        from isee3_decoder_tpu.ops.viterbi_inplace import decode_frame_inplace

        return decode_frame_inplace(
            fsyms, FRAMEBITS, SYNC_STATE, SYNC_STATE, cfg.code
        )
    return viterbi.decode_frame(
        fsyms, FRAMEBITS, SYNC_STATE, SYNC_STATE, cfg.code
    )


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Static decode configuration (decode.c:65-73 defaults)."""

    fano_enabled: bool = True
    viterbi_enabled: bool = True
    persistent: bool = False  # -p
    fano_scale: float = 8.0
    fano_delta: int = 32  # 4 * scale
    fano_maxcycles: int = 100
    code: CodeSpec = DEFAULT_CODE
    #: Viterbi kernel: "jnp" (reference), "inplace" (rotating-layout XLA
    #: kernel) or "fused" (fused-cycle Pallas kernels) — bit-identical.
    viterbi_backend: str = "jnp"

    def mettab(self) -> np.ndarray:
        """Fano metric table assuming threshold operation at Eb/N0=3 dB
        with symdemod's amplitude-100 normalization (decode.c:120-135)."""
        sig, noise = decoder_amplitudes(100.0, 1.0)
        return gen_met(sig, noise, 0.5, self.fano_scale)

    def fano_params(self) -> FanoParams:
        return FanoParams(delta=self.fano_delta, maxcycles=self.fano_maxcycles)


class FrameRecord(NamedTuple):
    """One decoded frame across all channels."""

    data: np.ndarray  # (B, FRAMEBITS//8) uint8 frame bytes
    good: np.ndarray  # (B,) bool — syncword verified (lock)
    decoder: np.ndarray  # (B,) int — NONE/VITERBI/FANO
    start_symbol: np.ndarray  # (B,) int64 absolute symbol index of frame start
    fano_cycles: np.ndarray  # (B,) int32


class DecodeStreamState:
    """Per-channel stream walk state (host side)."""

    def __init__(self, batch: int):
        self.batch = batch
        self.lock = np.zeros(batch, bool)
        self.pos = np.zeros(batch, np.int64)  # absolute index of buffer start
        self.sync_start = np.zeros(batch, np.int64)


def _gather_windows(symbols: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    """(B, length) windows at per-channel absolute starts."""
    idx = starts[:, None] + np.arange(length)[None, :]
    return np.take_along_axis(symbols, idx.astype(np.int64), axis=-1)


def decode_stream(
    symbols: np.ndarray,
    cfg: DecodeConfig = DecodeConfig(),
    state: DecodeStreamState | None = None,
    max_frames: int | None = None,
) -> tuple[list[FrameRecord], DecodeStreamState]:
    """Walk a (B, S) soft-symbol stream, emitting decoded frames.

    Mirrors the decode.c main loop: sync re-search when unlocked
    (decode.c:162-193), hybrid decode, verification, purge
    (decode.c:269-281).  The state can be carried across calls for true
    streaming.
    """
    if symbols.ndim == 1:
        symbols = symbols[None, :]
    symbols = np.ascontiguousarray(symbols)
    B, S = symbols.shape
    if state is None:
        state = DecodeStreamState(B)
    mettab = jnp.asarray(cfg.mettab())
    params = cfg.fano_params()
    k = cfg.code.k
    tail = SYNCWORD & ((1 << (k - 1)) - 1)

    records: list[FrameRecord] = []
    while max_frames is None or len(records) < max_frames:
        # Sync search for unlocked channels (a frame of positions, then a
        # frame+sync of symbols past the found start must be available).
        need = state.pos + (0 if state.lock.all() else 0) + FRAMESYMBOLS + SYNCBITS
        if (need > S).any():
            break
        if not state.lock.all():
            search_wins = _gather_windows(
                symbols, state.pos, FRAMESYMBOLS + SYNCBITS
            )
            ss, _ = find_sync(jnp.asarray(search_wins), FRAMESYMBOLS, cfg.code)
            ss = np.asarray(ss, np.int64)
            state.sync_start = np.where(state.lock, 0, ss)
        else:
            state.sync_start[:] = 0

        frame_start = state.pos + state.sync_start + SYNCBITS
        if (frame_start + FRAMESYMBOLS > S).any():
            break
        frame_syms = _gather_windows(symbols, frame_start, FRAMESYMBOLS)
        fsyms = jnp.asarray(frame_syms)

        decoder = np.full(B, DECODER_NONE, np.int32)
        bits = np.zeros((B, FRAMEBITS), np.uint8)
        decode_ok = np.zeros(B, bool)
        cycles = np.zeros(B, np.int32)

        if cfg.fano_enabled:
            res = fano_decode(
                fsyms, mettab, FRAMEBITS, SYNC_STATE, tail, cfg.code, params
            )
            decoder[:] = DECODER_FANO
            fano_ok = np.asarray(res.goodbits) == FRAMEBITS
            bits = np.asarray(res.bits)
            decode_ok = fano_ok
            cycles = np.asarray(res.cycles)

        if cfg.viterbi_enabled:
            # decode.c:209-214 fallback policy
            if not cfg.fano_enabled:
                need_vit = np.ones(B, bool)
            else:
                need_vit = (cfg.persistent | state.lock) & ~decode_ok
            if need_vit.any():
                sub = np.nonzero(need_vit)[0]
                vbits = _viterbi_decode(fsyms[sub], cfg)
                bits[sub] = np.asarray(vbits)
                decoder[sub] = DECODER_VITERBI
                decode_ok[sub] = True  # Viterbi always returns a frame

        good = decode_ok & np.asarray(verify_frame(jnp.asarray(bits)))
        state.lock = good.copy()

        records.append(
            FrameRecord(
                data=np.asarray(bits_to_bytes(jnp.asarray(bits))),
                good=good,
                decoder=decoder,
                start_symbol=frame_start.copy(),
                fano_cycles=cycles,
            )
        )
        # Purge the decoded frame (decode.c:269-281): the buffer now
        # starts at the sync sequence of the frame just decoded.
        state.pos = state.pos + state.sync_start + FRAMESYMBOLS
        state.sync_start[:] = 0
    return records, state


@functools.partial(jax.jit, static_argnames=("nframes", "cfg"))
def decode_frames_device(
    symbols: jax.Array,
    sync_start: jax.Array,
    nframes: int,
    cfg: DecodeConfig = DecodeConfig(),
):
    """Device-resident throughput decode: frame gather + lockstep Fano +
    syncword verify + byte packing in ONE jitted program.

    The host-orchestrated path costs ~6 host<->device round trips
    (~40 ms each through a tunneled runtime); this costs one small
    fetch.  Viterbi fallback stays host-driven (dynamic subset) —
    callers check ``fano_ok`` and re-decode failures.

    Returns (data_bytes (B*nframes, FRAMEBITS//8), good, fano_ok,
    cycles), all device arrays, lane order channel-major.
    """
    B, S = symbols.shape
    starts = (
        sync_start.astype(jnp.int32)[:, None]
        + SYNCBITS
        + FRAMESYMBOLS * jnp.arange(nframes, dtype=jnp.int32)[None, :]
    )
    idx = starts[..., None] + jnp.arange(FRAMESYMBOLS, dtype=jnp.int32)[None, None, :]
    fsyms = jnp.take_along_axis(
        symbols[:, None, :], idx.reshape(B, -1)[:, None, :], axis=-1
    ).reshape(B * nframes, FRAMESYMBOLS)

    k = cfg.code.k
    tail = SYNCWORD & ((1 << (k - 1)) - 1)
    res = fano_decode(
        fsyms,
        jnp.asarray(cfg.mettab()),
        FRAMEBITS,
        SYNC_STATE,
        tail,
        cfg.code,
        cfg.fano_params(),
    )
    fano_ok = res.goodbits == FRAMEBITS
    good = fano_ok & verify_frame(res.bits)
    data = bits_to_bytes(res.bits)
    return data, good, fano_ok, res.cycles


def decode_frames_batch(
    symbols: np.ndarray,
    sync_start: np.ndarray,
    nframes: int,
    cfg: DecodeConfig = DecodeConfig(),
) -> FrameRecord:
    """Throughput mode: decode ``nframes`` consecutive frames per channel
    in ONE lockstep Fano call (+ one batched Viterbi pass over failures).

    The frame axis joins the channel axis as a batch dimension
    (SURVEY.md §2.5 "frame-level batch Viterbi") — the TPU-native way to
    decode a locked stream.  Policy-wise this equals the reference's
    *persistent* hybrid mode (-p): every Fano failure falls back to
    Viterbi, without the previous-frame gating (which is inherently
    serial).

    Args:
      symbols: (B, S) soft symbols.
      sync_start: (B,) position of the sync preceding frame 0.
      nframes: frames per channel (caller guarantees
        sync_start + SYNCBITS + nframes*FRAMESYMBOLS <= S).

    Returns one FrameRecord with batch axis B*nframes (channel-major:
    record row b*nframes + f is channel b's frame f).
    """
    if symbols.ndim == 1:
        symbols = symbols[None, :]
    B, S = symbols.shape
    sync_start = np.broadcast_to(np.asarray(sync_start, np.int64), (B,))
    starts = (
        sync_start[:, None] + SYNCBITS + FRAMESYMBOLS * np.arange(nframes)[None, :]
    )  # (B, F)
    decoder = np.full(B * nframes, DECODER_NONE, np.int32)
    data = np.zeros((B * nframes, FRAMEBITS // 8), np.uint8)
    good = np.zeros(B * nframes, bool)
    decode_ok = np.zeros(B * nframes, bool)
    cycles = np.zeros(B * nframes, np.int32)

    if cfg.fano_enabled:
        # One jitted program does gather + lockstep Fano + verify + byte
        # packing; only the four small result arrays come back to host.
        ddata, dgood, dok, dcycles = decode_frames_device(
            jnp.asarray(symbols), jnp.asarray(sync_start, jnp.int32), nframes, cfg
        )
        data = np.asarray(ddata)
        good = np.asarray(dgood)
        decode_ok = np.asarray(dok)
        cycles = np.asarray(dcycles)
        decoder[:] = DECODER_FANO

    if cfg.viterbi_enabled:
        need = ~decode_ok if cfg.fano_enabled else np.ones(B * nframes, bool)
        if need.any():
            sub = np.nonzero(need)[0]
            idx = starts.reshape(-1)[sub, None] + np.arange(FRAMESYMBOLS)[None, :]
            fsyms = np.take_along_axis(
                symbols[sub // nframes], idx.astype(np.int64), axis=-1
            )
            vbits = _viterbi_decode(jnp.asarray(fsyms), cfg)
            data[sub] = np.asarray(bits_to_bytes(vbits))
            good[sub] = np.asarray(verify_frame(vbits))
            decoder[sub] = DECODER_VITERBI
            decode_ok[sub] = True

    return FrameRecord(
        data=data,
        good=good,
        decoder=decoder,
        start_symbol=starts.reshape(-1),
        fano_cycles=cycles,
    )


def format_frame(rec: FrameRecord, channel: int, frame_no: int, symrate: float = 1024.0) -> str:
    """Pretty-print one channel's frame like decode.c:249-265."""
    from isee3_decoder_tpu.utils.timeformat import format_hms

    name = {DECODER_VITERBI: "Viterbi", DECODER_FANO: "Fano"}.get(
        int(rec.decoder[channel]), "None"
    )
    start = int(rec.start_symbol[channel])
    head = (
        f"Frame {frame_no:,} at symbol {start:,} "
        f"({format_hms(start / symrate)}) with {name} "
        f"{'' if rec.good[channel] else '(bad)'}"
    )
    body = []
    data = rec.data[channel]
    for i in range(0, len(data), 16):
        body.append(" ".join(f"{b:02x}" for b in data[i : i + 16]))
    return head + "\n" + "\n".join(body) + "\n"
