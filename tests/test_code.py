"""Codec core tests: code tables, encoder, sync machinery."""

import numpy as np
import jax.numpy as jnp

from isee3_decoder_tpu import FRAMEBITS, SYNCBITS, SYNCWORD, config
from isee3_decoder_tpu.ops import bits_to_bytes, bytes_to_bits, encode_bits, encode_bytes

# Hard-coded sync correlator taps from the reference (decode.c:37-40).
DECODE_C_SYNC_VECTOR = [
    0, 1, 1, 1, 1, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0, 0, 1,
    1, 0, 0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def reference_encode(data_bytes, encstate, code):
    """Direct Python port of the shift-register semantics (encode.c:25-34).

    Used only as a test oracle for the vectorized encoder.
    """
    syms = []
    for byte in data_bytes:
        byte = int(byte)
        for i in range(7, -1, -1):
            encstate = (encstate << 1) | ((byte >> i) & 1)
            syms.append(code.g1flip ^ config.parity(encstate & code.poly1))
            syms.append(code.g2flip ^ config.parity(encstate & code.poly2))
    return syms, encstate & code.encstate_mask


def test_mcqli24_constants():
    c = config.MCQLI24
    assert c.poly1 == 0o73665667
    assert c.poly2 == 0o73665665
    assert c.k == 24
    assert (c.g1flip, c.g2flip) == (0, 1)
    assert c.nstates == 1 << 23


def test_sync_vector_matches_decode_c():
    assert list(config.sync_vector()) == DECODE_C_SYNC_VECTOR


def test_bit_packing_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(3, 16), dtype=np.uint8)
    bits = bytes_to_bits(jnp.asarray(data))
    back = bits_to_bytes(bits)
    np.testing.assert_array_equal(np.asarray(back), data)


def test_encoder_matches_reference_semantics():
    rng = np.random.default_rng(1)
    for code in [config.MCQLI24, config.RJ1, config.BJ24, config.MCQLI32]:
        data = rng.integers(0, 256, size=32, dtype=np.uint8)
        start = int(rng.integers(0, code.encstate_mask))
        want_syms, want_state = reference_encode(data, start, code)
        got_syms, got_state = encode_bytes(jnp.asarray(data), start, code)
        np.testing.assert_array_equal(np.asarray(got_syms), want_syms)
        assert int(got_state) == want_state


def test_encoder_batched():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 2, size=(4, 64), dtype=np.uint8)
    syms, state = encode_bits(jnp.asarray(data), 0)
    assert syms.shape == (4, 128)
    assert state.shape == (4,)
    # Each row independently matches the scalar path
    for i in range(4):
        s_i, st_i = encode_bits(jnp.asarray(data[i]), 0)
        np.testing.assert_array_equal(np.asarray(syms[i]), np.asarray(s_i))
        assert int(state[i]) == int(st_i)


def test_sync_symbols_end_frame():
    """A frame ending in the syncword produces the sync_vector as its
    last 34 symbols (the invariant decode.c exploits at decode.c:162-181)."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=FRAMEBITS // 8, dtype=np.uint8)
    data[-5:] = list(SYNCWORD.to_bytes(5, "big"))
    syms, state = encode_bytes(jnp.asarray(data), 0)
    assert list(np.asarray(syms[-SYNCBITS:])) == DECODE_C_SYNC_VECTOR
    assert int(state) == (SYNCWORD & 0xFFFFFF)


def test_quick_look_in_property():
    """MCQLI is a quick-look-in code: data bit = s1 ^ s2 ^ 1 (qdecode.c:129-134)."""
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, size=256, dtype=np.uint8)
    syms, _ = encode_bits(jnp.asarray(bits), 0)
    s = np.asarray(syms).reshape(-1, 2)
    recovered = s[:, 0] ^ s[:, 1] ^ 1
    # poly1 ^ poly2 == 0b10, so the quick look sees the bit one step back:
    # qdecode's output stream is the data delayed by one bit.
    np.testing.assert_array_equal(recovered[1:], bits[:-1])
