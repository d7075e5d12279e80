"""Native C++ golden decoder: cross-checks against the numpy oracle and the
device decoder, plus the record/replay bit-match harness (SURVEY.md §4)."""
import numpy as np
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.native import NativeGolden
from polar_tpu.oracle import sc_decode, scl_decode
from polar_tpu.sim.golden import load_golden, record_golden, replay_check
from polar_tpu.utils.gf2 import gf2_matmul


def _spec(factors, K, crc=None, seed=3):
    rng = np.random.default_rng(seed)
    N = int(np.prod(factors))
    nslots = K + (crc.width if crc else 0)
    frozen = np.ones(N, np.uint8)
    frozen[rng.choice(N, nslots, replace=False)] = 0
    return CodeSpec(N=N, K=K, factors=factors, frozen_mask=tuple(frozen), crc=crc)


def test_native_encode_matches_generator():
    rng = np.random.default_rng(0)
    for factors in [(2, 2, 2), (16,), (16, 2)]:
        spec = _spec(factors, int(np.prod(factors)) // 2)
        g = NativeGolden(spec)
        u = rng.integers(0, 2, (4, spec.N)).astype(np.uint8)
        assert np.array_equal(g.encode(u), gf2_matmul(u, spec.generator))


@pytest.mark.parametrize("factors,K,L,crc", [
    ((2, 2, 2, 2), 8, 1, None),
    ((2, 2, 2, 2), 8, 4, None),
    ((16,), 8, 2, None),
    ((2, 2, 2, 2, 2), 10, 4, CrcSpec(width=8, poly=0x07)),
])
def test_native_matches_numpy_oracle(factors, K, L, crc):
    spec = _spec(factors, K, crc)
    rng = np.random.default_rng(5)
    llrs = rng.normal(0.5, 2.0, (12, spec.N))
    g = NativeGolden(spec)
    got = g.decode(llrs, L)
    for i in range(llrs.shape[0]):
        ref = scl_decode(spec, llrs[i], L) if L > 1 else sc_decode(spec, llrs[i])
        assert np.array_equal(got[i], ref), i


@pytest.mark.slow
def test_flagship_golden_replay():
    """Replay the committed flagship-scale golden record (N=1024 K=512+CRC16
    SCL-8, BASELINE config 2): 256 mixed-SNR frames (incl. 43 erroneous ones
    that stress SURVEY.md §2.3 tie-breaking) recorded from the native C++
    golden decoder by scripts/flagship_golden.py. Both device backends
    bit-match it on the real chip (see RESULTS.md); this guards the XLA
    backend on CPU."""
    import pathlib
    rec = (pathlib.Path(__file__).resolve().parents[1] / "results" /
           "golden_ca_scl_b256.npz")
    res = replay_check(rec)
    assert res["frames"] == 256
    assert res["mismatch_frames"] == 0, res


def test_record_replay_bitmatch(tmp_path):
    spec = _spec((2, 2, 2, 2, 2), 12, CrcSpec(width=8, poly=0x07))
    rng = np.random.default_rng(9)
    llrs = rng.normal(0.7, 1.6, (24, spec.N))
    p = tmp_path / "golden.npz"
    record_golden(spec, 4, llrs, p)
    spec2, L2, llrs2, u_ref = load_golden(p)
    assert spec2 == spec and L2 == 4
    res = replay_check(p)
    assert res["mismatch_frames"] == 0, res


@pytest.mark.slow
def test_mixed_golden_replay():
    """Replay the committed mixed-kernel golden record (N=512 = 16*2^5
    BCH-major, K=256+CRC16, SCL-8; VERDICT r2 item 6): 128 mixed-SNR
    frames recorded from the native C++ golden decoder by
    scripts/mixed_golden.py — closes the golden bit-match chain for the
    BCH/mixed kernel-processing path (syndrome trellis + coset tables).
    LLRs are float32-rounded at record time, so the f32 device replay
    sees bit-identical inputs."""
    import pathlib
    rec = (pathlib.Path(__file__).resolve().parents[1] / "results" /
           "golden_mixed_scl_b128.npz")
    res = replay_check(rec)
    assert res["frames"] == 128
    assert res["mismatch_frames"] == 0, res
