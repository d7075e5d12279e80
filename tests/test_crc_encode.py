"""CRC and encoder tests (SURVEY.md §4: CRC vs known vectors; encode
linearity / Kronecker identity)."""
import numpy as np
import jax.numpy as jnp

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.ops.crc import crc_append, crc_check
from polar_tpu.ops.encode import assemble_u, encode_u, extract_payload
from polar_tpu.utils.gf2 import gf2_matmul


def test_crc16_ccitt_known_vector():
    # CRC-16/XMODEM (poly 0x1021, init 0) of ASCII "123456789" is 0x31C3.
    crc = CrcSpec(width=16, poly=0x1021, init=0)
    msg = b"123456789"
    bits = np.unpackbits(np.frombuffer(msg, np.uint8))  # MSB-first per byte
    out = crc.compute(bits)
    val = int("".join(map(str, out)), 2)
    assert val == 0x31C3


def test_crc_matrix_matches_bitwise():
    rng = np.random.default_rng(3)
    crc = CrcSpec(width=16, poly=0x1021, init=0xFFFF)
    k = 40
    info = rng.integers(0, 2, (8, k)).astype(np.uint8)
    dev = np.asarray(crc_append(crc, jnp.asarray(info)))
    for row_in, row_out in zip(info, dev):
        assert np.array_equal(row_out[:k], row_in)
        assert np.array_equal(row_out[k:], crc.compute(row_in))
    ok = np.asarray(crc_check(crc, jnp.asarray(dev)))
    assert ok.all()
    bad = dev.copy()
    bad[:, 0] ^= 1
    assert not np.asarray(crc_check(crc, jnp.asarray(bad))).any()


def _random_spec(rng, factors, K, crc=None):
    N = int(np.prod(factors))
    nslots = K + (crc.width if crc else 0)
    frozen = np.ones(N, np.uint8)
    frozen[rng.choice(N, nslots, replace=False)] = 0
    return CodeSpec(N=N, K=K, factors=factors, frozen_mask=tuple(frozen), crc=crc)


def test_encode_matches_generator():
    rng = np.random.default_rng(5)
    for factors in [(2, 2, 2), (16,), (16, 2), (2, 16), (2, 2, 16)]:
        spec = _random_spec(rng, factors, int(np.prod(factors)) // 2)
        u = rng.integers(0, 2, (6, spec.N)).astype(np.uint8)
        dev = np.asarray(encode_u(spec, jnp.asarray(u)))
        ref = gf2_matmul(u, spec.generator)
        assert np.array_equal(dev, ref), factors


def test_encode_linear():
    rng = np.random.default_rng(6)
    spec = _random_spec(rng, (2, 2, 2, 2), 8)
    u1 = rng.integers(0, 2, (4, 16)).astype(np.uint8)
    u2 = rng.integers(0, 2, (4, 16)).astype(np.uint8)
    x1 = np.asarray(encode_u(spec, jnp.asarray(u1)))
    x2 = np.asarray(encode_u(spec, jnp.asarray(u2)))
    x12 = np.asarray(encode_u(spec, jnp.asarray(u1 ^ u2)))
    assert np.array_equal(x12, x1 ^ x2)


def test_assemble_extract_roundtrip():
    rng = np.random.default_rng(7)
    spec = _random_spec(rng, (2, 2, 2, 2), 6)
    payload = rng.integers(0, 2, (5, 6)).astype(np.uint8)
    u = assemble_u(spec, jnp.asarray(payload))
    back = np.asarray(extract_payload(spec, u))
    assert np.array_equal(back, payload)
    u_np = np.asarray(u)
    assert not u_np[:, spec.frozen.astype(bool)].any()
