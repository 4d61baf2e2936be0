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


def _kernel(x_ref, mhr, mhi, mlr, mli, h0r, h0i, l0r, l0i, sr_ref, si_ref, *, nhi, flip):
    x = x_ref[...]
    lo = jnp.right_shift(jnp.left_shift(x, 16), 16).astype(jnp.float32)
    hi = jnp.right_shift(x, 16).astype(jnp.float32)
    i_, q_ = (hi, lo) if flip else (lo, hi)
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
    jax.jit, static_argnames=("n", "kp", "flip", "interpret")
)
def windowed_dft_raw(
    packed: jax.Array,
    first1: jax.Array,
    n: int,
    kp: int,
    flip: bool = False,
    interpret: bool = False,
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

    chan = pl.BlockSpec((_BT, None), lambda bi: (bi, 0))
    sr, si = pl.pallas_call(
        functools.partial(_kernel, nhi=nhi, flip=flip),
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
    )
    return (sr + 1j * si).astype(jnp.complex64)


def supports(B: int, n: int) -> bool:
    return B % _BT == 0 and n % 256 == 0
