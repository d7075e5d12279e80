"""Record + replay a mixed-kernel golden bit-match artifact.

VERDICT r2 item 6 / SURVEY.md §4 "Reference bit-match", §2.3 knob 3: the
flagship golden record (golden_ca_scl_b256.npz) covers only the pure
Arıkan path; this records mixed-kernel (16×2⁵) CA-SCL frames through the
independent native C++ golden decoder, closing the golden chain for the
BCH/mixed kernel-processing path (syndrome trellis + coset tables) at
the largest size the native decoder's brute-force tails can stomach
(N=512; N=4096 is infeasible at ~2^15 tail codewords per kernel input).

Run from repo root:
    python scripts/mixed_golden.py          # record (if absent) + replay
Replay alone also runs in tests/test_native_golden.py against the
committed artifact on the CPU backend.
"""
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

REC = pathlib.Path(__file__).resolve().parents[1] / "results" / \
    "golden_mixed_scl_b128.npz"
B = 128          # one Pallas batch tile
# Half the frames at 2.5 dB (mostly clean: exercises CRC-pass selection)
# and half at 1.0 dB (mostly erroneous: exercises the tie-breaking and
# path-metric conventions on wrong paths, SURVEY.md §2.3 knobs 4-5).
EBN0_DBS = (2.5, 1.0)
FACTORS = (16, 2, 2, 2, 2, 2)   # BCH-major mixed, N=512 (cf. mixed_scl32)
K, L = 256, 8


def build_spec():
    from polar_tpu.models.polar import CodeSpec, CrcSpec

    # Deterministic jittered reliability-by-index mask (same recipe as
    # tests/test_pallas_scl._mixed_spec): the kernel-processing paths under
    # bit-match test are mask-independent, and a mediocre code at 1.0 dB
    # produces exactly the erroneous survivor paths the record needs.
    N = int(np.prod(FACTORS))
    r = np.random.default_rng(1)
    nk = K + 16
    mask = np.ones(N, np.uint8)
    mask[np.argsort(r.random(N) + np.linspace(0, 1, N))[-nk:]] = 0
    return CodeSpec(N=N, K=K, factors=FACTORS,
                    frozen_mask=tuple(int(v) for v in mask),
                    crc=CrcSpec(16, 0x1021, 0))


def main():
    from polar_tpu.native import NativeGolden
    from polar_tpu.sim.channel import ebn0_to_sigma
    from polar_tpu.sim.golden import record_golden, replay_check
    from polar_tpu.utils.compilecache import enable

    enable()
    spec = build_spec()

    if not REC.exists():
        rng = np.random.default_rng(20260820)
        golden = NativeGolden(spec)
        info = rng.integers(0, 2, (B, spec.K), dtype=np.uint8)
        g = spec.crc.generator_matrix(spec.K).astype(np.uint8)
        off = spec.crc.offset_bits(spec.K).astype(np.uint8)
        crc_bits = (info @ g + off) % 2
        u = np.zeros((B, spec.N), np.uint8)
        u[:, ~spec.frozen.astype(bool)] = np.concatenate(
            [info, crc_bits.astype(np.uint8)], axis=1)
        x = golden.encode(u)
        sig = np.array([float(ebn0_to_sigma(db, spec.rate))
                        for db in EBN0_DBS])
        sigma = np.repeat(sig, B // len(EBN0_DBS))[:, None]
        y = (1.0 - 2.0 * x.astype(np.float64)) + sigma * rng.normal(
            size=x.shape)
        llrs = 2.0 * y / (sigma * sigma)
        t0 = time.time()
        record_golden(spec, L, llrs, REC)
        print(f"recorded {B} frames -> {REC} "
              f"({time.time() - t0:.1f}s native decode)", flush=True)

    backends = os.environ.get("GOLDEN_BACKENDS", "xla,pallas").split(",")
    ok = True
    for backend in backends:
        t0 = time.time()
        res = replay_check(REC, backend=backend)
        res.update(backend=backend, wall_s=round(time.time() - t0, 1))
        print(json.dumps(res), flush=True)
        ok &= res["mismatch_frames"] == 0
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
