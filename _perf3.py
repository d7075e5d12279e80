import time, numpy as np, jax, jax.numpy as jnp
from polar_tpu.models.presets import ca_scl
from polar_tpu.models.polar import CodeSpec
from polar_tpu.ops.scl import build_scl_decoder

# measure value-fetch roundtrip latency
x = jnp.float32(1.0)
for _ in range(2): v = float(x + 1)
t0 = time.perf_counter(); v = float(x + 2); rt = time.perf_counter() - t0
print(f"roundtrip latency: {rt*1e3:.1f} ms", flush=True)

def bench(tag, spec, L, B, reps=10):
    dec = jax.jit(build_scl_decoder(spec, L))
    llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)
    out = dec(llr); _ = float(jnp.sum(out.pm))   # compile + sync
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    cur = llr
    for _ in range(reps):
        out = dec(cur)
        acc = acc + jnp.sum(out.pm)
        cur = llr + 0.0 * acc          # true data dependency chain
    _ = float(acc)                     # forces the whole chain
    dt = (time.perf_counter() - t0 - rt) / reps
    print(f"{tag}: {dt*1e3:.2f} ms/call, {B/dt:.0f} cw/s", flush=True)

preset = ca_scl(); spec = preset.spec
bench("ca_scl crc16 L=8 B=2048", spec, 8, 2048)
spec2 = CodeSpec(N=spec.N, K=spec.K+16, factors=spec.factors, frozen_mask=spec.frozen_mask, crc=None)
bench("no-crc       L=8 B=2048", spec2, 8, 2048)
bench("ca_scl crc16 L=8 B=8192", spec, 8, 8192, reps=5)
bench("no-crc       L=1 B=8192", spec2, 1, 8192, reps=5)
