"""bf16-LLR A/B on the real chip (VERDICT r1 item 8).

FER A/B at 2.0 dB on identical noise keys: llr_dtype=float32 vs bfloat16
(ca_scl flagship), plus decode-rate rows for both dtypes. Emits JSONL.

Run from repo root: python benchmarks/bf16_ab.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from polar_tpu.utils.compilecache import enable

enable()

from polar_tpu.models.presets import get_preset
from polar_tpu.ops.crc import crc_append
from polar_tpu.ops.encode import encode
from polar_tpu.ops.scl import build_scl_decoder
from polar_tpu.sim.channel import ebn0_to_sigma

preset = get_preset("ca_scl")
spec, L = preset.spec, preset.list_size
B = 8192
EBN0 = 2.0
STEPS = 128          # 128 * 8192 = ~1.05M frames per arm
sigma = jnp.float32(ebn0_to_sigma(EBN0, spec.rate))


def make_arm(llr_dtype):
    decode = build_scl_decoder(spec, L, llr_dtype=llr_dtype)

    def step(carry, key):
        fe, be = carry
        k_info, k_noise = jax.random.split(key)
        info = jax.random.bernoulli(k_info, 0.5, (B, spec.K)).astype(jnp.int8)
        payload = crc_append(spec.crc, info)
        x = encode(spec, payload)
        y = (1.0 - 2.0 * x.astype(jnp.float32)) + sigma * jax.random.normal(
            k_noise, x.shape, jnp.float32)
        llr = 2.0 * y / (sigma * sigma)
        got = decode(llr).payload[:, :spec.K]
        err = got != info
        return (fe + jnp.sum(jnp.any(err, axis=1)), be + jnp.sum(err)), None

    @jax.jit
    def run(key):
        keys = jax.random.split(key, STEPS)
        (fe, be), _ = jax.lax.scan(step, (jnp.int32(0), jnp.int32(0)), keys)
        return fe, be

    return run


for name, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
    run = make_arm(dt)
    # warm-up run EXCLUDES the jit compile from the timed region —
    # VERDICT r3 weak 3: the r3 f32 arm paid its compile inside the
    # timed region, making the committed codewords_per_s a 9.4x artifact.
    # Fence with a value fetch (block_until_ready is unreliable through
    # the remote tunnel).
    int(run(jax.random.key(7))[0])
    t0 = time.time()
    fe, be = run(jax.random.key(1234))
    fe, be = int(fe), int(be)
    dtime = time.time() - t0
    frames = B * STEPS
    print(json.dumps({
        "arm": name, "ebn0_db": EBN0, "frames": frames, "frame_errors": fe,
        "fer": fe / frames, "bit_errors": be,
        "ber": be / (frames * spec.K),
        "wall_s": round(dtime, 1),
        "codewords_per_s": round(frames / dtime, 1)}), flush=True)
