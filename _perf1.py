import time, numpy as np, jax, jax.numpy as jnp
from polar_tpu.models.polar import CodeSpec
from polar_tpu.construction.ga import construct_ga
from polar_tpu.ops.scl import build_scl_decoder

def timeit(tag, spec, L, B, reps=3):
    dec = jax.jit(build_scl_decoder(spec, L))
    llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)
    out = dec(llr); out.u.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps): out = dec(llr)
    out.u.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:.1f} ms, {B/dt:.0f} cw/s, {dt/spec.N*1e6:.0f} us/leaf", flush=True)

def mkspec(n_stages, K):
    N = 1 << n_stages
    mask = tuple(int(v) for v in construct_ga(N, K, 2.0))
    return CodeSpec(N=N, K=K, factors=(2,)*n_stages, frozen_mask=mask)

s1024 = mkspec(10, 512)
s256 = mkspec(8, 128)
timeit("N=1024 L=8 B=2048", s1024, 8, 2048)
timeit("N=1024 L=8 B=256", s1024, 8, 256)
timeit("N=1024 L=1 B=2048", s1024, 1, 2048)
timeit("N=256  L=8 B=2048", s256, 8, 2048)
timeit("N=256  L=1 B=2048", s256, 1, 2048)
