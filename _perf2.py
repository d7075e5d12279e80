import time, numpy as np, jax, jax.numpy as jnp
from polar_tpu.models.presets import ca_scl
from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.scl import build_scl_decoder

preset = ca_scl()
spec = preset.spec

def timeit(tag, spec, L, B, reps=3):
    dec = jax.jit(build_scl_decoder(spec, L))
    llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)
    t0 = time.perf_counter()
    out = dec(llr); out.u.block_until_ready()
    print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps): out = dec(llr)
    out.u.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:.1f} ms, {B/dt:.0f} cw/s", flush=True)

# ca_scl spec WITH crc
timeit("ca_scl(crc16)", spec, 8, 2048)
# same frozen mask, no crc object
spec2 = CodeSpec(N=spec.N, K=spec.K+16, factors=spec.factors, frozen_mask=spec.frozen_mask, crc=None)
timeit("same-mask no-crc", spec2, 8, 2048)
