"""Generate and cache frozen-set artifacts for the named presets.

Run once per machine type (CPU ok, TPU faster):
    python scripts/gen_sequences.py [preset ...]
Artifacts land in polar_tpu/models/sequences/*.npy (committed to the repo
so presets load instantly and deterministically).
"""
import sys, pathlib
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from polar_tpu.construction.ga import construct_ga
from polar_tpu.construction.montecarlo import construct_mc

OUT = pathlib.Path(__file__).resolve().parents[1] / "polar_tpu/models/sequences"

SPECS = {
    # name: (factors, n_unfrozen, design_ebn0_db, method)
    "arikan_n1024_k512": ((2,)*10, 512, 2.0, "ga"),
    "arikan_n1024_k528": ((2,)*10, 528, 2.0, "ga"),       # 512 + CRC16
    "bch_n256_k128": ((16, 16), 128, 2.0, "mc"),
    "mixed_n4096_k2064": ((16, 16, 2, 2, 2, 2), 2064, 2.0, "mc"),  # 2048+CRC16
}

def build(name):
    factors, n_unfrozen, snr, method = SPECS[name]
    N = int(np.prod(factors))
    if method == "ga":
        mask = construct_ga(N, n_unfrozen, snr)
    else:
        frames = 1 << 15
        mask = construct_mc(factors, n_unfrozen, snr, frames=frames, seed=0)
    np.save(OUT / f"{name}.npy", mask)
    print(f"{name}: N={N} unfrozen={N-int(mask.sum())} -> {OUT/name}.npy")

if __name__ == "__main__":
    names = sys.argv[1:] or list(SPECS)
    for n in names:
        build(n)
