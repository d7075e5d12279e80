"""Scratch: unrolled vs fori_loop SCL decoder — bit-exactness + speed."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.models.presets import ca_scl
from polar_tpu.ops.scl import build_scl_decoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
check = "--nocheck" not in sys.argv
spec = ca_scl().spec

llr = 4.0 * jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)

dec_u = jax.jit(build_scl_decoder(spec, 8, unroll=True))
t0 = time.perf_counter()
out_u = dec_u(llr)
out_u.u.block_until_ready()
print(f"unroll compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

if check:
    dec_f = jax.jit(build_scl_decoder(spec, 8, unroll=False))
    out_f = dec_f(llr)
    assert np.array_equal(np.asarray(out_u.u), np.asarray(out_f.u)), "u mismatch"
    assert np.allclose(np.asarray(out_u.pm), np.asarray(out_f.pm)), "pm mismatch"
    print("bit-exact match unroll vs fori", flush=True)


def timeit(dec, name):
    o = dec(llr); o.u.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        o = dec(llr)
    o.u.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/decode, {B/dt:.0f} cw/s", flush=True)


timeit(dec_u, "unroll")
if check:
    timeit(dec_f, "fori  ")
