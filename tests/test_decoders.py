"""Decoder correctness: property tests + exact bit-match against the numpy
oracle (SURVEY.md §4 "Oracle cross-check" / "Property" rows)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.oracle import sc_decode, scl_decode
from polar_tpu.ops.encode import encode_u
from polar_tpu.ops.scl import build_scl_decoder

RNG = np.random.default_rng(11)


def _spec(factors, K, crc=None, seed=0):
    rng = np.random.default_rng(seed)
    N = int(np.prod(factors))
    nslots = K + (crc.width if crc else 0)
    frozen = np.ones(N, np.uint8)
    frozen[rng.choice(N, nslots, replace=False)] = 0
    return CodeSpec(N=N, K=K, factors=factors, frozen_mask=tuple(frozen), crc=crc)


def _noisy_frames(spec, B, noise=1.5, seed=1, valid_crc=False):
    rng = np.random.default_rng(seed)
    u = np.zeros((B, spec.N), np.uint8)
    if valid_crc and spec.crc is not None:
        from polar_tpu.ops.crc import crc_append
        info = rng.integers(0, 2, (B, spec.K)).astype(np.uint8)
        payload = np.asarray(crc_append(spec.crc, jnp.asarray(info)))
    else:
        payload = rng.integers(0, 2, (B, spec.n_payload_slots))
    u[:, spec.info_positions] = payload
    x = np.asarray(encode_u(spec, jnp.asarray(u)))
    llr = (1 - 2 * x.astype(np.float64)) * 2.0 + rng.normal(0, noise, (B, spec.N))
    return u, llr.astype(np.float32)


CONFIGS = [
    ((2, 2, 2, 2), 8, 1, None),
    ((2, 2, 2, 2), 8, 4, None),
    ((2, 2, 2, 2, 2), 10, 8, CrcSpec(width=8, poly=0x07)),
    ((16,), 8, 1, None),
    ((16,), 8, 4, None),
    ((16, 2), 16, 4, None),
    ((2, 16), 16, 4, None),
]


@pytest.mark.parametrize("factors,K,L,crc", CONFIGS)
def test_device_matches_oracle(factors, K, L, crc):
    spec = _spec(factors, K, crc)
    dec = jax.jit(build_scl_decoder(spec, L))
    B = 16
    _, llr = _noisy_frames(spec, B)
    out = np.asarray(dec(jnp.asarray(llr)).u)
    for i in range(B):
        ref = scl_decode(spec, llr[i], L) if L > 1 else sc_decode(spec, llr[i])
        assert np.array_equal(out[i], ref), f"frame {i} mismatch"


@pytest.mark.slow
def test_midsize_mixed_matches_oracle():
    """VERDICT.md r1 item 1: device-vs-oracle bit-match at a mid-size
    mixed-kernel CA-SCL config (N=128 = 16*2*2*2, L=8, CRC-16) anchoring
    BASELINE config 4's correctness chain (same kernel mix + CRC selection
    as mixed_scl32, at an oracle-tractable size)."""
    spec = _spec((16, 2, 2, 2), 60, CrcSpec(width=16, poly=0x1021), seed=3)
    L = 8
    dec = jax.jit(build_scl_decoder(spec, L))
    B = 4
    _, llr = _noisy_frames(spec, B, seed=7, valid_crc=True)
    out = np.asarray(dec(jnp.asarray(llr)).u)
    for i in range(B):
        ref = scl_decode(spec, llr[i], L)
        assert np.array_equal(out[i], ref), f"frame {i} mismatch"


def test_noiseless_roundtrip():
    for factors, K in [((2, 2, 2, 2, 2, 2), 32), ((16, 2, 2), 32)]:
        spec = _spec(factors, K)
        dec = jax.jit(build_scl_decoder(spec, 2))
        u = np.zeros((4, spec.N), np.uint8)
        u[:, spec.info_positions] = RNG.integers(0, 2, (4, K))
        x = np.asarray(encode_u(spec, jnp.asarray(u)))
        llr = ((1 - 2 * x) * 8.0).astype(np.float32)
        out = np.asarray(dec(jnp.asarray(llr)).u)
        assert np.array_equal(out, u)


def test_scl1_equals_sc():
    spec = _spec((2, 2, 2, 2), 8)
    dec1 = jax.jit(build_scl_decoder(spec, 1))
    _, llr = _noisy_frames(spec, 32, seed=9)
    out1 = np.asarray(dec1(jnp.asarray(llr)).u)
    for i in range(32):
        assert np.array_equal(out1[i], sc_decode(spec, llr[i]))


def test_crc_selection_improves():
    """CA-SCL should have FER <= plain-SCL-best-path on the same frames."""
    crc = CrcSpec(width=8, poly=0x07)
    spec = _spec((2, 2, 2, 2, 2), 12, crc)
    spec_nocrc = CodeSpec(N=spec.N, K=spec.K + 8, factors=spec.factors,
                          frozen_mask=spec.frozen_mask, crc=None)
    dec = jax.jit(build_scl_decoder(spec, 8))
    u, llr = _noisy_frames(spec, 128, noise=1.2, seed=13, valid_crc=True)
    out = np.asarray(dec(jnp.asarray(llr)).u)
    fer_ca = (out != u).any(axis=1).mean()
    dec0 = jax.jit(build_scl_decoder(spec_nocrc, 8))
    out0 = np.asarray(dec0(jnp.asarray(llr)).u)
    fer_plain = (out0 != u).any(axis=1).mean()
    assert fer_ca <= fer_plain + 1e-9
