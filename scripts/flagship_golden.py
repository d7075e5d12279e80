"""Record + replay a flagship-scale golden bit-match artifact.

VERDICT r1 item 6 / SURVEY.md §4 "Reference bit-match": the C++ golden
record/replay chain previously ran only at N=32; this records a few
hundred noisy N=1024 K=512+CRC16 SCL-8 frames (BASELINE config 2, the
primary-metric config) through the native golden decoder into a
committed .npz, then replays them through the device decoder backends
and requires zero mismatched frames.

Run from repo root:
    python scripts/flagship_golden.py            # record (if absent) + replay
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
    "golden_ca_scl_b256.npz"
B = 256          # multiple of the Pallas batch tile (128)
# Half the frames at 2.0 dB (mostly clean) and half at 1.0 dB (FER ~ 0.33)
# so the record exercises both CRC-pass selection and the erroneous-path
# tie-breaking conventions (SURVEY.md §2.3 knob 4).
EBN0_DBS = (2.0, 1.0)


def main():
    from polar_tpu.models.presets import ca_scl
    from polar_tpu.native import NativeGolden
    from polar_tpu.sim.channel import ebn0_to_sigma
    from polar_tpu.sim.golden import record_golden, replay_check
    from polar_tpu.utils.compilecache import enable

    enable()
    preset = ca_scl()
    spec, L = preset.spec, preset.list_size

    if not REC.exists():
        rng = np.random.default_rng(20260819)
        golden = NativeGolden(spec)
        # transmit real CRC-appended codewords so list selection is realistic
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
