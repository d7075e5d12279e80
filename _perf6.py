"""Scratch: unrolled SCL decoder throughput on the real TPU.

Timing via n decodes inside one jitted fori_loop + scalar fetch (tunnel
block_until_ready is unreliable; value fetch is the sync point).
"""
import sys
import time

import jax
import jax.numpy as jnp

from polar_tpu.utils.compilecache import enable
enable()

from polar_tpu.models.presets import ca_scl
from polar_tpu.ops.scl import build_scl_decoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
spec = ca_scl().spec
dec = build_scl_decoder(spec, 8, unroll=True)
print(f"devices: {jax.devices()}", flush=True)


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
v = float(many(llr, 1))
print(f"compile+1: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
v = float(many(llr, 1))
base = time.perf_counter() - t0
print(f"1 rep + fetch: {base:.2f}s", flush=True)
t0 = time.perf_counter()
v = float(many(llr, reps))
tot = time.perf_counter() - t0
dt = (tot - base) / (reps - 1)
print(f"B={B}: {dt*1e3:.2f} ms/decode, {B/dt:.0f} cw/s", flush=True)
