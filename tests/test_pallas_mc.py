"""Fused Monte-Carlo Pallas kernel (ops/pallas_scl.py mc=True).

CPU tests are structural: the TPU-semantics interpreter's PRNG returns
constant bits (measured: all-ones, so the Box-Muller draw is exactly
zero noise), which still exercises the full in-kernel
RNG->CRC->encode->channel->decode plumbing and its agreement with the
XLA reference ops. Statistical FER validation runs on the real chip
(RESULTS.md "Fused MC kernel").
"""
import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.construction.ga import construct_ga
from polar_tpu.ops.crc import crc_check
from polar_tpu.ops.encode import encode_u
from polar_tpu.ops.pallas_scl import build_pallas_mc_step

CRC16 = CrcSpec(width=16, poly=0x1021, init=0x0000)


def _spec(n, k, crc=None):
    extra = crc.width if crc else 0
    mask = construct_ga(n, k + extra, 2.0)
    return CodeSpec(N=n, K=k, factors=(2,) * int(np.log2(n)),
                    frozen_mask=tuple(int(v) for v in mask), crc=crc)


@pytest.mark.parametrize("crc,L", [(None, 1), (CRC16, 4)])
def test_fused_mc_structure(crc, L):
    spec = _spec(64, 24, crc)
    step = build_pallas_mc_step(spec, L, interpret=True)
    fe, be, u_true, res = step(jnp.asarray([7, 0], jnp.int32), jnp.float32(0.05), 128)
    u = np.asarray(u_true)                      # [N, B]
    frozen = np.asarray(spec.frozen, bool)
    # frozen rows carry zeros
    assert (u[frozen] == 0).all()
    pos = np.asarray(spec.info_positions)
    payload = u[pos].T                          # [B, K+W]
    if crc is not None:
        # in-kernel CRC (extended-generator MXU matmul) == XLA crc_check
        assert np.asarray(crc_check(crc, jnp.asarray(payload))).all()
    # (near-)noiseless round trip: in-kernel encode must be the exact
    # GF(2) transform the decoder inverts -> zero errors
    assert int(fe) == 0 and int(be) == 0
    # decoded u equals transmitted u everywhere, not just info positions
    assert np.array_equal(np.asarray(res.u).T, u)


@pytest.mark.slow
def test_fused_mc_encode_matches_xla():
    """The kernel's stagewise butterfly == ops/encode.encode_u on the
    transmitted u (checked indirectly: decode of the noiseless channel
    output reproduces u, and directly: re-encoding u_true and pushing it
    through the plain decoder gives the same payload)."""
    spec = _spec(128, 56, CRC16)
    step = build_pallas_mc_step(spec, 2, interpret=True)
    _, _, u_true, res = step(jnp.asarray([3, 0], jnp.int32), jnp.float32(0.02), 128)
    x = np.asarray(encode_u(spec, jnp.asarray(np.asarray(u_true).T)))
    # noiseless LLRs from the XLA-side re-encode, through the XLA decoder
    from polar_tpu.ops.scl import build_scl_decoder
    llr = (1.0 - 2.0 * x.astype(np.float32)) * 800.0
    out = build_scl_decoder(spec, 2)(jnp.asarray(llr))
    assert np.array_equal(np.asarray(out.u), np.asarray(u_true).T)


@pytest.mark.parametrize("crc,L", [
    (None, 1),
    pytest.param(CRC16, 4, marks=pytest.mark.slow),
])
def test_fused_counters_mode_matches_full(crc, L):
    """counters=True (in-kernel CRC/select/count) must produce exactly
    the counts the full mode + XLA epilogue produce on the same seed
    (same PRNG stream -> same frames)."""
    spec = _spec(64, 24, crc)
    full = build_pallas_mc_step(spec, L, interpret=True)
    cnt = build_pallas_mc_step(spec, L, interpret=True, counters=True)
    for seed, sig in ((3, 0.05), (5, 0.9)):
        fe_f, be_f, _, _ = full(jnp.asarray([seed, 1], jnp.int32), jnp.float32(sig), 128)
        fe_c, be_c, _, _ = cnt(jnp.asarray([seed, 1], jnp.int32), jnp.float32(sig), 128)
        assert int(fe_f) == int(fe_c)
        assert int(be_f) == int(be_c)


@pytest.mark.slow
def test_fused_counters_real_noise():
    """ADVICE r3 (medium): drive the in-kernel CRC-syndrome check,
    best-path selection, and error counting with REAL frame errors on
    CPU. The interpreter PRNG is constant, so inject the channel noise
    (noise_input hook): full mode, counters mode, and an XLA decode of
    the bit-identical LLRs must agree frame-for-frame, with fe > 0."""
    import jax
    from polar_tpu.ops.scl import build_scl_decoder

    spec = _spec(64, 24, CRC16)
    L, B, sigma = 4, 128, 0.9
    noise = np.asarray(
        jax.random.normal(jax.random.key(11), (spec.N, B)), np.float32)
    full = build_pallas_mc_step(spec, L, interpret=True, noise_input=True)
    cnt = build_pallas_mc_step(spec, L, interpret=True, counters=True,
                               noise_input=True)
    fe_f, be_f, u_true, res = full(jnp.asarray([3, 2], jnp.int32), jnp.float32(sigma), B,
                                   jnp.asarray(noise))
    fe_c, be_c, _, _ = cnt(jnp.asarray([3, 2], jnp.int32), jnp.float32(sigma), B,
                           jnp.asarray(noise))
    assert int(fe_f) > 0, "sigma=0.9 must produce frame errors"
    assert int(fe_f) == int(fe_c) and int(be_f) == int(be_c)
    # XLA cross-check on bit-identical LLRs (same f32 expression order
    # as the kernel prologue): decisions and counts must match exactly
    sg = jnp.float32(sigma)
    x = encode_u(spec, jnp.asarray(np.asarray(u_true).T)).astype(
        jnp.float32)
    y = (1.0 - 2.0 * x) + sg * jnp.asarray(noise).T
    llr = (2.0 / (sg * sg)) * y
    out = build_scl_decoder(spec, L)(llr)
    assert np.array_equal(np.asarray(out.u), np.asarray(res.u))
    mask = np.zeros(spec.N, bool)
    mask[np.asarray(spec.info_positions)[:spec.K]] = True
    diff = (np.asarray(out.u) != np.asarray(u_true).T) & mask[None, :]
    assert int(diff.any(axis=1).sum()) == int(fe_c)
    assert int(diff.sum()) == int(be_c)


@pytest.mark.parametrize("factors,k,L,crc", [
    ((16,), 6, 1, None),                  # pure eBCH kernel (bch_sc shape)
    pytest.param((16, 2), 12, 2, CrcSpec(8, 0x07, 0),
                 marks=pytest.mark.slow),
])
def test_fused_mc_bch_kernels(factors, k, L, crc):
    """VERDICT r3 item 3: the fused-MC prologue (PRNG/CRC/encode/AWGN)
    through l>2 eBCH kernel stages — noiseless round trip + counters
    equality."""
    N = int(np.prod(factors))
    extra = crc.width if crc else 0
    rng = np.random.default_rng(5)
    mask = np.ones(N, np.uint8)
    mask[np.argsort(rng.random(N) + np.linspace(0, 1, N))[-(k + extra):]] = 0
    spec = CodeSpec(N=N, K=k, factors=tuple(factors),
                    frozen_mask=tuple(int(v) for v in mask), crc=crc)
    full = build_pallas_mc_step(spec, L, interpret=True)
    fe, be, u_true, res = full(jnp.asarray([9, 3], jnp.int32), jnp.float32(0.03), 128)
    assert int(fe) == 0 and int(be) == 0
    assert np.array_equal(np.asarray(res.u).T, np.asarray(u_true))
    # in-kernel Kronecker encode through the eBCH factor == ops/encode
    x = np.asarray(encode_u(spec, jnp.asarray(np.asarray(u_true).T)))
    assert x.shape == (128, N)
    cnt = build_pallas_mc_step(spec, L, interpret=True, counters=True)
    fe_c, be_c, _, _ = cnt(jnp.asarray([9, 3], jnp.int32), jnp.float32(0.03), 128)
    assert int(fe_c) == 0 and int(be_c) == 0


def test_fused_harness_backend():
    """backend='fused' wires through make_mc_step and counts frames."""
    import jax
    from polar_tpu.sim.harness import make_mc_step
    spec = _spec(64, 24, CRC16)
    step = make_mc_step(spec, 2, steps_per_call=2, backend="fused",
                        interpret=True)
    out = step(jax.random.key(0), {"sigma": jnp.float32(0.05)}, 128)
    assert int(out["frames"]) == 256
    assert int(out["frame_errors"]) == 0
