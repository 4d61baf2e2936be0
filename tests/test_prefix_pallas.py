"""One-pass Pallas prefix-sum kernel: equivalence with the jnp path."""

import numpy as np
import jax
import jax.numpy as jnp

from isee3_decoder_tpu.ops.prefix_pallas import prefix_sum_blocks, prefix_sum_flat


def _ref_exclusive(flat: np.ndarray) -> np.ndarray:
    cs = np.cumsum(flat.astype(np.int64), axis=1)
    return np.concatenate(
        [np.zeros((flat.shape[0], 1), np.int64), cs], axis=1
    )[:, : flat.shape[1]].astype(np.int32)  # int32 wraparound like prod


def test_prefix_sum_blocks_matches_reference():
    rng = np.random.default_rng(0)
    T, B, n = 4, 16, 640
    blocks = rng.integers(-32768, 32768, (T, B, n), dtype=np.int64).astype(
        np.int16
    )
    out = np.asarray(prefix_sum_blocks(jnp.asarray(blocks), interpret=True))
    flat = np.swapaxes(blocks, 0, 1).reshape(B, T * n)
    np.testing.assert_array_equal(out, _ref_exclusive(flat))


def test_prefix_sum_flat_matches_reference():
    rng = np.random.default_rng(1)
    B, L = 8, 8192
    s = rng.integers(-32768, 32768, (B, L), dtype=np.int64).astype(np.int16)
    out = np.asarray(prefix_sum_flat(jnp.asarray(s), tile=2048, interpret=True))
    np.testing.assert_array_equal(out, _ref_exclusive(s))


def test_demod_fused_csum_matches_jnp_path():
    """demod_to_symbols with the fused Pallas csum (interpret mode) is
    bit-identical to the classic transpose + jnp prefix-sum path."""
    from isee3_decoder_tpu.models.decode import DecodeConfig
    from isee3_decoder_tpu.models.pipeline import PipelineConfig, demod_to_symbols
    from isee3_decoder_tpu.ops.carrier import PMConfig
    from isee3_decoder_tpu.ops.symbols import SymConfig
    from isee3_decoder_tpu.utils import testsignal

    rng = np.random.default_rng(2)
    frames = testsignal.random_frames(rng, 3)
    samprate, symrate = 32768.0, 1024.0
    iq = testsignal.synthesize_iq(
        frames,
        samprate=samprate,
        symrate=symrate,
        carrier=5000.0,
        noise_std=800.0,
        lead_symbols=40,
        rng=rng,
    )
    # 8 channels (kernel needs B % 8 == 0), int16 raw ingestion layout
    raw = testsignal.iq_to_int16(iq)
    raws = jnp.asarray(np.broadcast_to(raw, (8, raw.size)))

    base = PipelineConfig(
        pm=PMConfig(samprate=samprate, binsize=8.0, search_width=100.0),
        sym=SymConfig(samprate=samprate, symrate=symrate),
        decode=DecodeConfig(),
    )
    cfg_jnp = PipelineConfig(base.pm, base.sym, base.decode, csum_backend="jnp")
    cfg_pal = PipelineConfig(
        base.pm, base.sym, base.decode, csum_backend="pallas_interpret"
    )
    from isee3_decoder_tpu.models.pipeline import _fused_csum_ok

    n = base.pm.fftsize
    L = raw.size // 2
    nb = L // n
    from isee3_decoder_tpu.models.symdemod import initial_firstsample, window_samples

    nwin = max((nb * n - initial_firstsample(base.sym)) // window_samples(base.sym) - 1, 0)
    assert _fused_csum_ok(cfg_pal, 8, n, nb, nwin), "gate should accept test shapes"

    soft_j, bb_j, fr_j, cn_j = jax.jit(
        demod_to_symbols, static_argnames=("cfg",)
    )(raws, cfg_jnp)
    soft_p, bb_p, fr_p, cn_p = jax.jit(
        demod_to_symbols, static_argnames=("cfg",)
    )(raws, cfg_pal)
    np.testing.assert_array_equal(np.asarray(soft_p), np.asarray(soft_j))
    np.testing.assert_array_equal(np.asarray(bb_p), np.asarray(bb_j))
    np.testing.assert_array_equal(np.asarray(cn_p), np.asarray(cn_j))
