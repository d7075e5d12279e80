"""Scratch: BCH (config 3) and mixed-kernel (config 4) decode throughput."""
import sys
import time

import jax
import jax.numpy as jnp

from polar_tpu.utils.compilecache import enable
enable()

from polar_tpu.models.presets import bch_sc, mixed_scl32
from polar_tpu.ops.scl import build_scl_decoder

which = sys.argv[1] if len(sys.argv) > 1 else "bch"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

if which == "bch":
    preset = bch_sc()
else:
    preset = mixed_scl32()
spec, L = preset.spec, preset.list_size
print(f"{preset.name}: N={spec.N} L={L} B={B}", flush=True)
dec = build_scl_decoder(spec, L)


@jax.jit
def many(llr, n):
    def body(_, carry):
        cur, acc = carry
        out = dec(cur)
        s = jnp.sum(out.pm)
        return (llr + 0.0 * s, acc + s)
    return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]


llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)
t0 = time.perf_counter()
float(many(llr, 1))
print(f"compile+1: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
float(many(llr, 1))
base = time.perf_counter() - t0
t0 = time.perf_counter()
float(many(llr, reps + 1))
dt = (time.perf_counter() - t0 - base) / reps
print(f"{preset.name} B={B}: {dt*1e3:.3f} ms/decode, {B/dt:.0f} cw/s",
      flush=True)
