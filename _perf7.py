"""Scratch: batch/dtype/list-size scaling of the unrolled decoder on TPU."""
import sys
import time

import jax
import jax.numpy as jnp

from polar_tpu.utils.compilecache import enable
enable()

from polar_tpu.models.presets import ca_scl, arikan_sc
from polar_tpu.ops.scl import build_scl_decoder


def measure(name, spec, L, B, reps=8, **kw):
    dec = build_scl_decoder(spec, L, **kw)

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
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(llr, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(llr, reps + 1))
    dt = (time.perf_counter() - t0 - base) / reps
    print(f"{name:28s} B={B:5d}: {dt*1e3:8.3f} ms/decode, {B/dt:9.0f} cw/s"
          f"  (compile {tc:.0f}s)", flush=True)


ca = ca_scl()
sc = arikan_sc()
for B in (1024, 2048, 4096, 8192):
    measure("ca_scl L=8 f32", ca.spec, 8, B)
measure("ca_scl L=8 bf16", ca.spec, 8, 4096, llr_dtype=jnp.bfloat16)
for B in (4096, 16384):
    measure("arikan SC f32", sc.spec, 1, B)
