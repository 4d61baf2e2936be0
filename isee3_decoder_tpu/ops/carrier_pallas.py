"""Pallas windowed matmul-DFT carrier search over packed raw int16 IQ.

The locked-path carrier search (ops/carrier.find_carrier_windowed)
evaluates only the ~100 window bins by a mix-folded Cooley-Tukey split —
two einsums on the MXU.  Fed from XLA those einsums force the int16 IQ
to materialize as complex64 (8 bytes/sample written + read back), which
is most of pmdemod's HBM traffic.  This kernel reads the *packed* int16
words straight from HBM, unpacks them with shifts in VMEM, and runs the
same contraction in-kernel: traffic drops to the 4 raw bytes/sample.

Math identical to find_carrier_windowed (carrier.py:234-297) up to f32
matmul accumulation order; see pmdemod.c:246-318 for the reference
behavior both implement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BT = 8  # channels per grid step


def pack_raw(raw: jax.Array) -> jax.Array:
    """(…, 2n) int16 interleaved I,Q → (…, n) int32 packed words
    (little-endian: I in the low half).  Pure bitcast, no data movement.
    """
    return jax.lax.bitcast_convert_type(
        raw.reshape(*raw.shape[:-1], -1, 2), jnp.int32
    )


def _chirp_tables(n: int, dop: float):
    """Host f64 de-chirp tables for the DFT kernels: cos/-sin of
    2π·(dop·i(i+1)/2 mod 1) reshaped (n//256, 256) to match the
    mix-folded Cooley-Tukey data layout (sample i = 256h + t).  The
    chirp phase has an h·t cross term, so it cannot fold into the two
    DFT factor matrices — it must rotate the DATA (pmdemod.c:232-244
    de-rotates before the FFT for the same reason)."""
    ii = np.arange(n, dtype=np.float64)
    phi = (dop * (ii * (ii + 1.0) / 2.0)) % 1.0
    ang = 2.0 * np.pi * phi
    return (
        jnp.asarray(np.cos(ang).astype(np.float32).reshape(-1, 256)),
        jnp.asarray((-np.sin(ang)).astype(np.float32).reshape(-1, 256)),
    )


def _dechirp(i_, q_, dchr, dchi, nhi):
    """Rotate unpacked (BT, n) IQ by the de-chirp tables in VMEM."""
    xr3 = i_.reshape(_BT, nhi, 256)
    xi3 = q_.reshape(_BT, nhi, 256)
    dr = dchr[...][None, :, :]
    di = dchi[...][None, :, :]
    return xr3 * dr - xi3 * di, xi3 * dr + xr3 * di


def _kernel(x_ref, mhr, mhi, mlr, mli, h0r, h0i, l0r, l0i, *rest, nhi, flip, dop):
    if dop:
        dchr, dchi, sr_ref, si_ref = rest
    else:
        sr_ref, si_ref = rest
    x = x_ref[...]
    lo = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
    hi = jnp.right_shift(x, 16).astype(jnp.float32)
    i_, q_ = (hi, lo) if flip else (lo, hi)
    if dop:
        xr, xi = _dechirp(i_, q_, dchr, dchi, nhi)
    else:
        xr = i_.reshape(_BT, nhi, 256)
        xi = q_.reshape(_BT, nhi, 256)
    dn = (((0,), (0,)), ((), ()))  # contract dim 0 with dim 0
    for c in range(_BT):
        hr = mhr[c][:, None] * h0r[...] - mhi[c][:, None] * h0i[...]
        hi_t = mhr[c][:, None] * h0i[...] + mhi[c][:, None] * h0r[...]
        ar = (
            jax.lax.dot_general(xr[c], hr, dn)
            - jax.lax.dot_general(xi[c], hi_t, dn)
        )
        ai = (
            jax.lax.dot_general(xr[c], hi_t, dn)
            + jax.lax.dot_general(xi[c], hr, dn)
        )
        wr = mlr[c][:, None] * l0r[...] - mli[c][:, None] * l0i[...]
        wi = mlr[c][:, None] * l0i[...] + mli[c][:, None] * l0r[...]
        sr_ref[c, :] = (ar * wr - ai * wi).sum(axis=0)
        si_ref[c, :] = (ar * wi + ai * wr).sum(axis=0)


@functools.partial(
    jax.jit, static_argnames=("n", "kp", "flip", "interpret", "dop")
)
def windowed_dft_raw(
    packed: jax.Array,
    first1: jax.Array,
    n: int,
    kp: int,
    flip: bool = False,
    interpret: bool = False,
    dop: float = 0.0,
) -> jax.Array:
    """(B, n) packed int32 IQ words + (B,) window start bins → (B, kp)
    complex64 spectrum bins first1 .. first1+kp-1 of the n-point DFT.

    Requires B % 8 == 0, n % 256 == 0, kp % 128 == 0, and the exact-int32
    phase-arithmetic bounds of carrier._fast_search_capable.
    """
    B = packed.shape[0]
    nhi = n // 256
    assert B % _BT == 0 and n % 256 == 0 and kp % 128 == 0

    kk = np.arange(kp, dtype=np.int64)
    h = np.arange(nhi, dtype=np.int64)
    tl = np.arange(256, dtype=np.int64)

    def cexp_np(num, den):
        return np.exp((-2j * np.pi / den) * num.astype(np.float32)).astype(
            np.complex64
        )

    hi0 = cexp_np((h[:, None] * kk[None, :]) % nhi, nhi)
    lo0 = cexp_np((tl[:, None] * kk[None, :]) % n, n)

    def cexp(num, den):
        return jnp.exp((-2j * np.pi / den) * num.astype(jnp.float32)).astype(
            jnp.complex64
        )

    hj = jnp.asarray(h, jnp.int32)
    tj = jnp.asarray(tl, jnp.int32)
    mixh = cexp((hj[None, :] * (first1 % nhi)[:, None]) % nhi, nhi)
    mixl = cexp((tj[None, :] * (first1 % n)[:, None]) % n, n)

    chirp_ops = []
    chirp_specs = []
    if dop:
        dchr, dchi = _chirp_tables(n, dop)
        chirp_ops = [dchr, dchi]
        chirp_specs = [
            pl.BlockSpec((nhi, 256), lambda bi: (0, 0)),
            pl.BlockSpec((nhi, 256), lambda bi: (0, 0)),
        ]
    chan = pl.BlockSpec((_BT, None), lambda bi: (bi, 0))
    sr, si = pl.pallas_call(
        functools.partial(_kernel, nhi=nhi, flip=flip, dop=dop),
        grid=(B // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, n), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, nhi), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, nhi), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 256), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 256), lambda bi: (bi, 0)),
            pl.BlockSpec((nhi, kp), lambda bi: (0, 0)),
            pl.BlockSpec((nhi, kp), lambda bi: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi: (0, 0)),
            *chirp_specs,
        ],
        out_specs=[
            pl.BlockSpec((_BT, kp), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, kp), lambda bi: (bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, kp), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        packed,
        mixh.real, mixh.imag, mixl.real, mixl.imag,
        jnp.asarray(hi0.real), jnp.asarray(hi0.imag),
        jnp.asarray(lo0.real), jnp.asarray(lo0.imag),
        *chirp_ops,
    )
    return (sr + 1j * si).astype(jnp.complex64)


def supports(B: int, n: int) -> bool:
    return B % _BT == 0 and n % 256 == 0


_CH = 8192  # samples per in-kernel chunk (f32 temporaries 256 KB each)


def _chirp_cycles(k: int, ch: int, dop: float):
    """Static per-chunk de-chirp phase for samples i = k·ch + j, in
    CYCLES: φ(i) = dop·i(i+1)/2 with dop = Doppler_rate/samprate²
    (pmdemod.c:232-244's per-sample double integration, per-block
    restart).  Host-side f64 mod-1 reduction of the chunk base and the
    linear coefficient keeps every traced term small enough for f32
    (the j² term itself is < 0.03 cycles at mission Doppler rates).

    Returns (A, Bk, B256, C) Python floats for
    φ(j) = A + B256·(j//256) + Bk·(j%256) + C·j².
    """
    base = float(k) * ch
    A = (0.5 * dop * base * base + 0.5 * dop * base) % 1.0
    Bk = (dop * base + 0.5 * dop) % 1.0
    B256 = (256.0 * Bk) % 1.0
    return A, Bk, B256, 0.5 * dop


def _spin_kernel(x_ref, c_ref, bb_ref, stat_ref, *, flip, samprate, dop):
    """One-read spin-down: five-moment C/N0 + rotate + int16 emission
    over a VMEM-resident (BT, n) packed-int16 tile.

    Pass 1 unpacks + mixes once and accumulates the spun-signal moments
    that give the carrier DC phasor and noise variance
    (pmdemod.c:328-351); the spun chunks are kept live as VMEM
    temporaries (2×2 MB at n=65536) and pass 2 reuses them to rotate
    the carrier onto the I axis and emit the Q (data) axis scaled by √½
    as int16 (pmdemod.c:360-368) — the kernel is
    VPU-transcendental-bound, so computing the per-sample cos/sin once
    instead of once per pass is the win.  Same expressions as
    carrier._moments_cn0 / spin_down up to sum-order.  ``dop`` (static,
    cycles/sample²) folds the Doppler de-chirp into the same mix angle —
    the chirped-downlink configuration stays on the fast path.
    """
    n = x_ref.shape[1]
    nk = n // _CH
    c = c_ref[:, 0:1]  # (BT, 1) cycles/sample
    c256 = jnp.mod(c * 256.0, 1.0)

    def spun_chunk(k):
        # identical two-level phase range reduction to carrier._lo_ramp
        x = x_ref[:, k * _CH : (k + 1) * _CH]
        lo = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
        hi = jnp.right_shift(x, 16).astype(jnp.float32)
        i_, q_ = (hi, lo) if flip else (lo, hi)
        idx = jax.lax.broadcasted_iota(jnp.int32, (_BT, _CH), 1) + k * _CH
        ihi = (idx // 256).astype(jnp.float32)
        ilo = (idx % 256).astype(jnp.float32)
        cyc = c256 * ihi + c * ilo
        if dop:
            j = jax.lax.broadcasted_iota(jnp.int32, (_BT, _CH), 1)
            jf = j.astype(jnp.float32)
            jh = (j // 256).astype(jnp.float32)
            jl = (j % 256).astype(jnp.float32)
            A, Bk, B256, C = _chirp_cycles(k, _CH, dop)
            cyc = cyc + (
                np.float32(A)
                + np.float32(B256) * jh
                + np.float32(Bk) * jl
                + np.float32(C) * (jf * jf)
            )
        ang = (2 * np.pi) * cyc
        lor = jnp.cos(ang)
        loi = -jnp.sin(ang)
        sr = i_ * lor - q_ * loi
        si = i_ * loi + q_ * lor
        return sr, si

    z = jnp.zeros((_BT, _CH), jnp.float32)
    a_r, a_i, a_rr, a_ii, a_ri = z, z, z, z, z
    spun = []
    for k in range(nk):
        sr, si = spun_chunk(k)
        spun.append((sr, si))
        a_r = a_r + sr
        a_i = a_i + si
        a_rr = a_rr + sr * sr
        a_ii = a_ii + si * si
        a_ri = a_ri + sr * si
    inv = np.float32(1.0 / n)
    m_r = a_r.sum(axis=1, keepdims=True) * inv
    m_i = a_i.sum(axis=1, keepdims=True) * inv
    m_rr = a_rr.sum(axis=1, keepdims=True) * inv
    m_ii = a_ii.sum(axis=1, keepdims=True) * inv
    m_ri = a_ri.sum(axis=1, keepdims=True) * inv

    amp2 = m_r * m_r + m_i * m_i
    amp = jnp.sqrt(amp2)
    safe2 = jnp.where(amp2 > 0, amp2, 1.0)
    e_rot2 = (m_rr * m_r * m_r + 2 * m_ri * m_r * m_i + m_ii * m_i * m_i) / safe2
    var = jnp.maximum(e_rot2 - amp2, amp2 * np.float32(3e-7) + np.float32(1e-30))
    cn0 = (10 / np.float32(np.log(10.0))) * jnp.log(
        np.float32(samprate) * amp2 / (2 * var)
    )
    safe_amp = jnp.where(amp > 0, amp, 1.0)
    ur = jnp.where(amp > 0, m_r / safe_amp, 1.0)  # unit = conj(dc)/amp
    ui = jnp.where(amp > 0, -m_i / safe_amp, 0.0)

    scale = np.float32(np.sqrt(0.5))
    for k, (sr, si) in enumerate(spun):
        rot_i = sr * ui + si * ur  # imag(spun · unit)
        bb_ref[:, k * _CH : (k + 1) * _CH] = jnp.trunc(rot_i * scale).astype(
            jnp.int16
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BT, 128), 1)
    stat_ref[...] = jnp.where(lane == 0, amp, jnp.where(lane == 1, cn0, 0.0))


@functools.partial(
    jax.jit, static_argnames=("samprate", "flip", "interpret", "dop")
)
def spin_down_fused(
    raw: jax.Array,
    carrier_freq: jax.Array,
    samprate: float,
    flip: bool = False,
    interpret: bool = False,
    dop: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(B, 2n) raw int16 + (B,) Hz → (baseband int16 (B, n), amp, cn0_db)
    in ONE HBM read of the raw words (carrier.spin_down_raw needs two).
    Matches carrier.spin_down's f32 branch up to f32 sum order (baseband
    within 1 LSB where moment ulps move trunc boundaries).  ``dop``
    (static, cycles/sample²) folds the Doppler de-chirp into the mix."""
    packed = pack_raw(raw)
    B, n = packed.shape
    assert B % _BT == 0 and n % _CH == 0
    c = (carrier_freq / np.float32(samprate)).astype(jnp.float32)
    cb = jnp.broadcast_to(c[:, None], (B, 128))
    bb, stat = pl.pallas_call(
        functools.partial(_spin_kernel, flip=flip, samprate=samprate, dop=dop),
        grid=(B // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, n), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 128), lambda bi: (bi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BT, n), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 128), lambda bi: (bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), jnp.int16),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(packed, cb)
    return bb, stat[:, 0], stat[:, 1]


def spin_supports(B: int, n: int) -> bool:
    return B % _BT == 0 and n % _CH == 0


def _tau(x):
    """Quinn's second estimator helper (pmdemod.c:43-46)."""
    r32 = np.float32(np.sqrt(2 / 3.0))
    return np.float32(0.25) * jnp.log(3 * x * x + 6 * x + 1) - np.float32(
        np.sqrt(6.0) / 24
    ) * jnp.log((x + 1 - r32) / (x + 1 + r32))


def _scan_kernel(
    x_ref, bb0_ref, init_ref, h0r, h0i, l0r, l0i,
    csum_ref, stat_ref, tot_ref,
    c_c, c_n, c_s, bb_s,
    *, nhi, kp, flip, samprate, binsize, search_width, cn0_threshold, wmax,
):
    """Whole pmdemod time loop in ONE kernel: grid (B/8, T), t innermost.

    VMEM scratch carries the reference's cross-block globals
    (Carrier_search_freq, cn0 — pmdemod.c:37,63) plus the running int32
    baseband total, so the T-block scan needs a single dispatch instead
    of T.  Each t>0 step assumes the locked windowed path and emits a
    per-channel ok lane replicating carrier._fast_search_ok; the wrapper
    falls back to the block scan when any lane fails.  Block 0 (cold
    start / possible full-passband search) is computed outside and fed
    in as bb0 + init lanes.  Output is the exclusive int32 prefix sum of
    the baseband in (B, T·n) layout — the symdemod front-end's input —
    so the baseband int16 stream never exists in HBM at all.
    """
    from isee3_decoder_tpu.ops.prefix_pallas import _tile_cumsum

    n = x_ref.shape[-1]
    t = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BT, 128), 1)

    @pl.when(t == 0)
    def _():
        init = init_ref[...]  # lanes: 0 amp, 1 cn0, 2 freq, 3 center
        c_c[...] = init[:, 3:4]
        c_n[...] = init[:, 1:2]
        x0 = bb0_ref[...].astype(jnp.int32)
        inc, tot = _tile_cumsum(x0)
        csum_ref[...] = inc - x0
        c_s[...] = tot
        # stat lanes: 0 amp, 1 cn0, 2 freq, 3 ok, 5 new center
        stat_ref[...] = jnp.where(
            lane == 3,
            np.float32(1.0),
            jnp.where(lane == 5, init[:, 3:4], init),
        )
        tot_ref[...] = jnp.broadcast_to(tot, (_BT, 128))

    @pl.when(t > 0)
    def _():
        fs = np.float32(samprate)
        bsz = np.float32(binsize)
        w = np.float32(search_width)
        center = c_c[...]  # (BT, 1)
        cn0p = c_n[...]
        lo_f = center - w
        hi_f = center + w
        first = jnp.trunc(lo_f / bsz).astype(jnp.int32)
        last = jnp.trunc(hi_f / bsz).astype(jnp.int32)
        # per-channel carrier._fast_search_ok: locked, strictly positive
        # non-wrapping window that fits the static K
        okw = (
            (cn0p > np.float32(cn0_threshold))
            & (lo_f >= bsz)
            & (hi_f < fs / 2 - bsz)
            & (first >= 1)
            & (last > first)
            & (last - first <= wmax - 2)
        )
        first1 = jnp.where(okw, first, 1) - 1  # safe phases when !okw
        wlen = jnp.where(okw, last - first, 1)

        # per-channel twiddle mix vectors from exact int32 phases
        # (= carrier.find_carrier_windowed's mixh/mixl)
        hio = jax.lax.broadcasted_iota(jnp.int32, (_BT, nhi), 1)
        ah = (2 * np.pi / nhi) * ((hio * (first1 % nhi)) % nhi).astype(
            jnp.float32
        )
        mhr, mhi = jnp.cos(ah), -jnp.sin(ah)
        tlo = jax.lax.broadcasted_iota(jnp.int32, (_BT, 256), 1)
        al = (2 * np.pi / n) * ((tlo * (first1 % n)) % n).astype(jnp.float32)
        mlr, mli = jnp.cos(al), -jnp.sin(al)

        # ---- windowed matmul-DFT (as _locked_kernel pass 1) ----
        x = x_ref[...]
        lo16 = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
        hi16 = jnp.right_shift(x, 16).astype(jnp.float32)
        i_, q_ = (hi16, lo16) if flip else (lo16, hi16)
        xr = i_.reshape(_BT, nhi, 256)
        xi = q_.reshape(_BT, nhi, 256)
        dn = (((0,), (0,)), ((), ()))
        srs, sis = [], []
        for c in range(_BT):
            hr = mhr[c][:, None] * h0r[...] - mhi[c][:, None] * h0i[...]
            hi_t = mhr[c][:, None] * h0i[...] + mhi[c][:, None] * h0r[...]
            ar = (
                jax.lax.dot_general(xr[c], hr, dn)
                - jax.lax.dot_general(xi[c], hi_t, dn)
            )
            ai = (
                jax.lax.dot_general(xr[c], hi_t, dn)
                + jax.lax.dot_general(xi[c], hr, dn)
            )
            wr = mlr[c][:, None] * l0r[...] - mli[c][:, None] * l0i[...]
            wi = mlr[c][:, None] * l0i[...] + mli[c][:, None] * l0r[...]
            srs.append((ar * wr - ai * wi).sum(axis=0, keepdims=True))
            sis.append((ar * wi + ai * wr).sum(axis=0, keepdims=True))
        sr_all = jnp.concatenate(srs, axis=0)
        si_all = jnp.concatenate(sis, axis=0)

        # ---- masked last-max peak + Quinn (as _locked_kernel pass 2) ----
        energy = sr_all * sr_all + si_all * si_all
        kk = jax.lax.broadcasted_iota(jnp.int32, (_BT, kp), 1)
        mask = (kk >= 1) & (kk < wlen + 1)
        masked = jnp.where(mask, energy, np.float32(-1.0))
        m = masked.max(axis=1, keepdims=True)
        pk = jnp.where(masked == m, kk, jnp.int32(-1)).max(
            axis=1, keepdims=True
        )

        def lane_pick(arr, idx):
            return jnp.where(kk == idx, arr, np.float32(0.0)).sum(
                axis=1, keepdims=True
            )

        maxenergy = lane_pick(energy, pk)
        sp_r, sp_i = lane_pick(sr_all, pk), lane_pick(si_all, pk)
        sn_r, sn_i = lane_pick(sr_all, pk + 1), lane_pick(si_all, pk + 1)
        sm_r, sm_i = lane_pick(sr_all, pk - 1), lane_pick(si_all, pk - 1)
        safe = jnp.where(maxenergy > 0, maxenergy, np.float32(1.0))
        ap = (sn_r * sp_r + sn_i * sp_i) / safe
        dp = -ap / (1 - ap)
        am = (sm_r * sp_r + sm_i * sp_i) / safe
        dm = am / (1 - am)
        d = (dp + dm) * np.float32(0.5) + _tau(dp * dp) - _tau(dm * dm)
        d = jnp.where(maxenergy > 0, d, np.float32(0.0))
        peak = (first1 + pk).astype(jnp.float32)
        freq = np.float32(binsize) * (peak + d)
        freq = jnp.where(freq > fs / 2, freq - fs, freq)

        # ---- spin-down moments + rotate + csum emission ----
        cc = freq / fs
        c256 = jnp.mod(cc * 256.0, 1.0)
        nk = n // _CH

        def spun_chunk(k):
            xc = x_ref[:, k * _CH : (k + 1) * _CH]
            lo_ = jnp.right_shift(jnp.left_shift(xc, 16), 16).astype(
                jnp.float32
            )
            hi_ = jnp.right_shift(xc, 16).astype(jnp.float32)
            ii, qq = (hi_, lo_) if flip else (lo_, hi_)
            idx = jax.lax.broadcasted_iota(jnp.int32, (_BT, _CH), 1) + k * _CH
            ihi = (idx // 256).astype(jnp.float32)
            ilo = (idx % 256).astype(jnp.float32)
            ang = (2 * np.pi) * (c256 * ihi + cc * ilo)
            lor = jnp.cos(ang)
            loi = -jnp.sin(ang)
            return ii * lor - qq * loi, ii * loi + qq * lor

        z = jnp.zeros((_BT, _CH), jnp.float32)
        a_r, a_i, a_rr, a_ii, a_ri = z, z, z, z, z
        spun = []
        for k in range(nk):
            sr, si = spun_chunk(k)
            spun.append((sr, si))
            a_r = a_r + sr
            a_i = a_i + si
            a_rr = a_rr + sr * sr
            a_ii = a_ii + si * si
            a_ri = a_ri + sr * si
        inv = np.float32(1.0 / n)
        m_r = a_r.sum(axis=1, keepdims=True) * inv
        m_i = a_i.sum(axis=1, keepdims=True) * inv
        m_rr = a_rr.sum(axis=1, keepdims=True) * inv
        m_ii = a_ii.sum(axis=1, keepdims=True) * inv
        m_ri = a_ri.sum(axis=1, keepdims=True) * inv

        amp2 = m_r * m_r + m_i * m_i
        amp = jnp.sqrt(amp2)
        safe2 = jnp.where(amp2 > 0, amp2, 1.0)
        e_rot2 = (
            m_rr * m_r * m_r + 2 * m_ri * m_r * m_i + m_ii * m_i * m_i
        ) / safe2
        var = jnp.maximum(e_rot2 - amp2, amp2 * np.float32(3e-7) + np.float32(1e-30))
        cn0 = (10 / np.float32(np.log(10.0))) * jnp.log(fs * amp2 / (2 * var))
        safe_amp = jnp.where(amp > 0, amp, 1.0)
        ur = jnp.where(amp > 0, m_r / safe_amp, 1.0)
        ui = jnp.where(amp > 0, -m_i / safe_amp, 0.0)

        scale = np.float32(np.sqrt(0.5))
        for k, (sr, si) in enumerate(spun):
            rot_i = sr * ui + si * ur
            bb_s[:, k * _CH : (k + 1) * _CH] = jnp.trunc(
                rot_i * scale
            ).astype(jnp.int32)
        xbb = bb_s[...]
        inc, tot = _tile_cumsum(xbb)
        csum_ref[...] = inc - xbb + c_s[...]
        c_s[...] = c_s[...] + tot
        tot_ref[...] = jnp.broadcast_to(c_s[...], (_BT, 128))

        lockedv = cn0 > np.float32(cn0_threshold)
        new_center = jnp.where(lockedv, freq, center)
        c_c[...] = new_center
        c_n[...] = cn0
        okf = jnp.where(okw, np.float32(1.0), np.float32(0.0))
        stat_ref[...] = jnp.where(
            lane == 0,
            amp,
            jnp.where(
                lane == 1,
                cn0,
                jnp.where(
                    lane == 2,
                    freq,
                    jnp.where(lane == 3, okf, new_center),
                ),
            ),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "samprate", "binsize", "search_width", "cn0_threshold", "wmax",
        "flip", "interpret",
    ),
)
def pm_scan_locked_fused(
    packed_blocks: jax.Array,
    bb0: jax.Array,
    init: jax.Array,
    samprate: float,
    binsize: float,
    search_width: float,
    cn0_threshold: float,
    wmax: int,
    flip: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Entire pmdemod block loop (pmdemod.c:204-372) in one dispatch.

    Args:
      packed_blocks: (B, T, n) packed int32 IQ words (pack_raw layout).
      bb0: (B, n) int16 block-0 baseband from the cold-start block step.
      init: (B, 4) f32 per-channel [amp0, cn00, freq0, center_after_0].
    Returns (csum (B, T·n) int32 exclusive prefix sum of the baseband,
    stat (B, T, 6) f32 [amp, cn0, freq, ok, ·, new_center], totals (B,)
    int32 inclusive sum of all T·n baseband samples).  Callers must pass
    the _fast_search_capable / spin_supports / prefix supports gates and
    fall back to the block scan when any ok lane is 0 (see
    carrier.pm_demod_scan_csum).
    """
    B, T, n = packed_blocks.shape
    packed_flat = packed_blocks.reshape(B, T * n)
    nhi = n // 256
    kp = -(-wmax // 128) * 128
    assert B % _BT == 0 and n % 256 == 0 and n % _CH == 0

    kk = np.arange(kp, dtype=np.int64)
    h = np.arange(nhi, dtype=np.int64)
    tl = np.arange(256, dtype=np.int64)

    def cexp_np(num, den):
        return np.exp((-2j * np.pi / den) * num.astype(np.float32)).astype(
            np.complex64
        )

    hi0 = cexp_np((h[:, None] * kk[None, :]) % nhi, nhi)
    lo0 = cexp_np((tl[:, None] * kk[None, :]) % n, n)

    init128 = jnp.pad(init.astype(jnp.float32), ((0, 0), (0, 124)))

    csum, stat, tots = pl.pallas_call(
        functools.partial(
            _scan_kernel,
            nhi=nhi,
            kp=kp,
            flip=flip,
            samprate=samprate,
            binsize=binsize,
            search_width=search_width,
            cn0_threshold=cn0_threshold,
            wmax=wmax,
        ),
        grid=(B // _BT, T),
        in_specs=[
            pl.BlockSpec((_BT, n), lambda bi, t: (bi, t)),
            pl.BlockSpec((_BT, n), lambda bi, t: (bi, 0)),
            pl.BlockSpec((_BT, 128), lambda bi, t: (bi, 0)),
            pl.BlockSpec((nhi, kp), lambda bi, t: (0, 0)),
            pl.BlockSpec((nhi, kp), lambda bi, t: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi, t: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi, t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_BT, n), lambda bi, t: (bi, t)),
            pl.BlockSpec((_BT, 128), lambda bi, t: (bi, t)),
            pl.BlockSpec((_BT, 128), lambda bi, t: (bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T * n), jnp.int32),
            jax.ShapeDtypeStruct((B, T * 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BT, 1), jnp.float32),
            pltpu.VMEM((_BT, 1), jnp.float32),
            pltpu.VMEM((_BT, 1), jnp.int32),
            pltpu.VMEM((_BT, n), jnp.int32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        packed_flat,
        bb0,
        init128,
        jnp.asarray(hi0.real), jnp.asarray(hi0.imag),
        jnp.asarray(lo0.real), jnp.asarray(lo0.imag),
    )
    stat6 = stat.reshape(B, T, 128)[:, :, :6]
    return csum, stat6, tots[:, 0]


def _locked_kernel(
    x_ref, iw_ref, mhr, mhi, mlr, mli, h0r, h0i, l0r, l0i,
    *rest,
    nhi, kp, flip, samprate, binsize, dop,
):
    """Whole locked-path pm block in one HBM read: windowed DFT search →
    masked peak + Quinn → spin-down moments → rotate + int16 emission.

    The (BT, n) packed tile stays in VMEM across all three passes.  The
    spun (mixed-down) samples are computed once in the moments pass and
    kept live as VMEM temporaries (2×2 MB at n=65536) so the emission
    pass skips the second unpack + per-sample cos/sin — the spin half
    of the kernel is VPU-transcendental-bound, not HBM-bound, so
    computing the trig once is the win.  Math matches
    carrier.find_carrier_windowed → _windowed_peak_from_s → spin_down's
    f32 branch (pmdemod.c:246-368) up to f32 sum order.
    """
    if dop:
        dchr, dchi, bb_ref, stat_ref, s_r, s_i = rest
    else:
        bb_ref, stat_ref, s_r, s_i = rest
    n = x_ref.shape[1]
    # ---- pass 1: windowed matmul-DFT (same contraction as _kernel) ----
    x = x_ref[...]
    lo = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
    hi = jnp.right_shift(x, 16).astype(jnp.float32)
    i_, q_ = (hi, lo) if flip else (lo, hi)
    if dop:
        xr, xi = _dechirp(i_, q_, dchr, dchi, nhi)
    else:
        xr = i_.reshape(_BT, nhi, 256)
        xi = q_.reshape(_BT, nhi, 256)
    dn = (((0,), (0,)), ((), ()))
    for c in range(_BT):
        hr = mhr[c][:, None] * h0r[...] - mhi[c][:, None] * h0i[...]
        hi_t = mhr[c][:, None] * h0i[...] + mhi[c][:, None] * h0r[...]
        ar = (
            jax.lax.dot_general(xr[c], hr, dn)
            - jax.lax.dot_general(xi[c], hi_t, dn)
        )
        ai = (
            jax.lax.dot_general(xr[c], hi_t, dn)
            + jax.lax.dot_general(xi[c], hr, dn)
        )
        wr = mlr[c][:, None] * l0r[...] - mli[c][:, None] * l0i[...]
        wi = mlr[c][:, None] * l0i[...] + mli[c][:, None] * l0r[...]
        s_r[c, :] = (ar * wr - ai * wi).sum(axis=0)
        s_i[c, :] = (ar * wi + ai * wr).sum(axis=0)

    # ---- pass 2: masked last-max peak + Quinn (pmdemod.c:257-318) ----
    sr_all = s_r[...]
    si_all = s_i[...]
    energy = sr_all * sr_all + si_all * si_all
    kk = jax.lax.broadcasted_iota(jnp.int32, (_BT, kp), 1)
    first1 = iw_ref[:, 0:1]  # (BT, 1) int32
    wlen = iw_ref[:, 1:2]  # last - first
    mask = (kk >= 1) & (kk < wlen + 1)
    masked = jnp.where(mask, energy, np.float32(-1.0))
    m = masked.max(axis=1, keepdims=True)
    pk = jnp.where(masked == m, kk, jnp.int32(-1)).max(axis=1, keepdims=True)

    def lane_pick(arr, idx):
        return jnp.where(kk == idx, arr, np.float32(0.0)).sum(
            axis=1, keepdims=True
        )

    maxenergy = lane_pick(energy, pk)
    sp_r, sp_i = lane_pick(sr_all, pk), lane_pick(si_all, pk)
    sn_r, sn_i = lane_pick(sr_all, pk + 1), lane_pick(si_all, pk + 1)
    sm_r, sm_i = lane_pick(sr_all, pk - 1), lane_pick(si_all, pk - 1)
    safe = jnp.where(maxenergy > 0, maxenergy, np.float32(1.0))
    ap = (sn_r * sp_r + sn_i * sp_i) / safe
    dp = -ap / (1 - ap)
    am = (sm_r * sp_r + sm_i * sp_i) / safe
    dm = am / (1 - am)
    d = (dp + dm) * np.float32(0.5) + _tau(dp * dp) - _tau(dm * dm)
    d = jnp.where(maxenergy > 0, d, np.float32(0.0))
    peak = (first1 + pk).astype(jnp.float32)
    freq = np.float32(binsize) * (peak + d)
    fs = np.float32(samprate)
    freq = jnp.where(freq > fs / 2, freq - fs, freq)

    # ---- passes 3+4: spin-down moments, rotate, emit (as _spin_kernel) —
    cc = freq / fs  # (BT, 1) cycles/sample
    c256 = jnp.mod(cc * 256.0, 1.0)
    nk = n // _CH

    def spun_chunk(k):
        xc = x_ref[:, k * _CH : (k + 1) * _CH]
        lo = jnp.right_shift(jnp.left_shift(xc, 16), 16).astype(jnp.float32)
        hi = jnp.right_shift(xc, 16).astype(jnp.float32)
        i_, q_ = (hi, lo) if flip else (lo, hi)
        idx = jax.lax.broadcasted_iota(jnp.int32, (_BT, _CH), 1) + k * _CH
        ihi = (idx // 256).astype(jnp.float32)
        ilo = (idx % 256).astype(jnp.float32)
        cyc = c256 * ihi + cc * ilo
        if dop:
            j = jax.lax.broadcasted_iota(jnp.int32, (_BT, _CH), 1)
            jf = j.astype(jnp.float32)
            jh = (j // 256).astype(jnp.float32)
            jl = (j % 256).astype(jnp.float32)
            A, Bk, B256, C = _chirp_cycles(k, _CH, dop)
            cyc = cyc + (
                np.float32(A)
                + np.float32(B256) * jh
                + np.float32(Bk) * jl
                + np.float32(C) * (jf * jf)
            )
        ang = (2 * np.pi) * cyc
        lor = jnp.cos(ang)
        loi = -jnp.sin(ang)
        sr = i_ * lor - q_ * loi
        si = i_ * loi + q_ * lor
        return sr, si

    z = jnp.zeros((_BT, _CH), jnp.float32)
    a_r, a_i, a_rr, a_ii, a_ri = z, z, z, z, z
    spun = []
    for k in range(nk):
        sr, si = spun_chunk(k)
        spun.append((sr, si))
        a_r = a_r + sr
        a_i = a_i + si
        a_rr = a_rr + sr * sr
        a_ii = a_ii + si * si
        a_ri = a_ri + sr * si
    inv = np.float32(1.0 / n)
    m_r = a_r.sum(axis=1, keepdims=True) * inv
    m_i = a_i.sum(axis=1, keepdims=True) * inv
    m_rr = a_rr.sum(axis=1, keepdims=True) * inv
    m_ii = a_ii.sum(axis=1, keepdims=True) * inv
    m_ri = a_ri.sum(axis=1, keepdims=True) * inv

    amp2 = m_r * m_r + m_i * m_i
    amp = jnp.sqrt(amp2)
    safe2 = jnp.where(amp2 > 0, amp2, 1.0)
    e_rot2 = (m_rr * m_r * m_r + 2 * m_ri * m_r * m_i + m_ii * m_i * m_i) / safe2
    var = jnp.maximum(e_rot2 - amp2, amp2 * np.float32(3e-7) + np.float32(1e-30))
    cn0 = (10 / np.float32(np.log(10.0))) * jnp.log(fs * amp2 / (2 * var))
    safe_amp = jnp.where(amp > 0, amp, 1.0)
    ur = jnp.where(amp > 0, m_r / safe_amp, 1.0)
    ui = jnp.where(amp > 0, -m_i / safe_amp, 0.0)

    scale = np.float32(np.sqrt(0.5))
    for k, (sr, si) in enumerate(spun):
        rot_i = sr * ui + si * ur
        bb_ref[:, k * _CH : (k + 1) * _CH] = jnp.trunc(rot_i * scale).astype(
            jnp.int16
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BT, 128), 1)
    stat_ref[...] = jnp.where(
        lane == 0,
        amp,
        jnp.where(lane == 1, cn0, jnp.where(lane == 2, freq, peak)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "kp", "samprate", "binsize", "flip", "interpret", "dop"
    ),
)
def pm_locked_fused(
    packed: jax.Array,
    first1: jax.Array,
    wlen: jax.Array,
    n: int,
    kp: int,
    samprate: float,
    binsize: float,
    flip: bool = False,
    interpret: bool = False,
    dop: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Entire locked pm block from (B, n) packed int16 IQ words in one
    HBM read: → (baseband int16 (B, n), carrier_freq, amp, cn0_db).

    first1 = firstbin-1, wlen = lastbin-firstbin per channel (see
    carrier._search_window); callers must pass the
    carrier._fast_search_capable + spin_supports gates."""
    B = packed.shape[0]
    nhi = n // 256
    assert B % _BT == 0 and n % 256 == 0 and n % _CH == 0 and kp % 128 == 0

    kk = np.arange(kp, dtype=np.int64)
    h = np.arange(nhi, dtype=np.int64)
    tl = np.arange(256, dtype=np.int64)

    def cexp_np(num, den):
        return np.exp((-2j * np.pi / den) * num.astype(np.float32)).astype(
            np.complex64
        )

    hi0 = cexp_np((h[:, None] * kk[None, :]) % nhi, nhi)
    lo0 = cexp_np((tl[:, None] * kk[None, :]) % n, n)

    def cexp(num, den):
        return jnp.exp((-2j * np.pi / den) * num.astype(jnp.float32)).astype(
            jnp.complex64
        )

    hj = jnp.asarray(h, jnp.int32)
    tj = jnp.asarray(tl, jnp.int32)
    mixh = cexp((hj[None, :] * (first1 % nhi)[:, None]) % nhi, nhi)
    mixl = cexp((tj[None, :] * (first1 % n)[:, None]) % n, n)

    iw = jnp.stack(
        [first1.astype(jnp.int32), wlen.astype(jnp.int32)], axis=1
    )
    iw = jnp.pad(iw, ((0, 0), (0, 126)))

    chirp_ops = []
    chirp_specs = []
    if dop:
        dchr, dchi = _chirp_tables(n, dop)
        chirp_ops = [dchr, dchi]
        chirp_specs = [
            pl.BlockSpec((nhi, 256), lambda bi: (0, 0)),
            pl.BlockSpec((nhi, 256), lambda bi: (0, 0)),
        ]
    bb, stat = pl.pallas_call(
        functools.partial(
            _locked_kernel,
            nhi=nhi,
            kp=kp,
            flip=flip,
            samprate=samprate,
            binsize=binsize,
            dop=dop,
        ),
        grid=(B // _BT,),
        in_specs=[
            pl.BlockSpec((_BT, n), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 128), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, nhi), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, nhi), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 256), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 256), lambda bi: (bi, 0)),
            pl.BlockSpec((nhi, kp), lambda bi: (0, 0)),
            pl.BlockSpec((nhi, kp), lambda bi: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi: (0, 0)),
            pl.BlockSpec((256, kp), lambda bi: (0, 0)),
            *chirp_specs,
        ],
        out_specs=[
            pl.BlockSpec((_BT, n), lambda bi: (bi, 0)),
            pl.BlockSpec((_BT, 128), lambda bi: (bi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), jnp.int16),
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BT, kp), jnp.float32),
            pltpu.VMEM((_BT, kp), jnp.float32),
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        packed,
        iw,
        mixh.real, mixh.imag, mixl.real, mixl.imag,
        jnp.asarray(hi0.real), jnp.asarray(hi0.imag),
        jnp.asarray(lo0.real), jnp.asarray(lo0.imag),
        *chirp_ops,
    )
    return bb, stat[:, 2], stat[:, 0], stat[:, 1]
