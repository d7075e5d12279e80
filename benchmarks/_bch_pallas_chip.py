"""On-chip validation + bench of the Pallas BCH mega-kernel (bch_sc).

Run from repo root on the real TPU: python benchmarks/_bch_pallas_chip.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.utils.compilecache import enable

enable()

from polar_tpu.models.presets import get_preset
from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
from polar_tpu.ops.scl import build_scl_decoder

preset = get_preset("bch_sc")
spec, L = preset.spec, preset.list_size
B = 4096
llr = 2.5 * jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)

xla = jax.jit(build_scl_decoder(spec, L))
t0 = time.time()
a = xla(llr)
a.u.block_until_ready()
print(f"xla compile+run {time.time() - t0:.1f}s", flush=True)

pal = jax.jit(build_pallas_scl_decoder(spec, L))
t0 = time.time()
b = pal(llr)
b.u.block_until_ready()
print(f"pallas compile+run {time.time() - t0:.1f}s", flush=True)

match = {f: bool(jnp.all(getattr(a, f) == getattr(b, f)))
         for f in ("u", "payload", "crc_ok", "pm")}
print("bit-match:", match, flush=True)

def bench(fn, n=16):
    def loop(x):
        def body(_, c):
            r = fn(c)
            return c * 1.0 + 0.0 * r.pm[0, None].astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    lp = jax.jit(loop)
    lp(llr)[0, 0].block_until_ready()
    t0 = time.time()
    v = lp(llr)
    float(v[0, 0])
    dt = (time.time() - t0) / n
    return dt

for name, fn in (("xla", xla), ("pallas", pal)):
    dt = bench(fn)
    print(json.dumps({"preset": "bch_sc", "backend": name, "batch": B,
                      "ms_per_decode": round(dt * 1e3, 3),
                      "codewords_per_s": round(B / dt, 1)}), flush=True)
