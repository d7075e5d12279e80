"""Benchmark: decoded codewords/s/chip on the flagship config.

Primary metric (BASELINE.json:2): decoded codewords/s/chip for N=1024
CA-SCL L=8. North star: 1e6 cw/s on a v5e-8 => 125k cw/s/chip
(BASELINE.json:5); vs_baseline is measured against that per-chip target.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}.
"""
import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.models.presets import ca_scl
    from polar_tpu.ops.scl import build_scl_decoder
    from polar_tpu.sim.channel import ebn0_to_sigma

    import os

    preset = ca_scl()
    spec = preset.spec
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    backend = os.environ.get("BENCH_DECODER", "pallas")
    if backend == "pallas":
        from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
        decode = build_pallas_scl_decoder(spec, preset.list_size)
    else:
        decode = build_scl_decoder(spec, preset.list_size)

    sigma = float(ebn0_to_sigma(2.0, spec.rate))
    key = jax.random.key(0)
    # decode-only bench (the reference's hot loop is >95% decode,
    # SURVEY.md §3.1); llrs generated once outside the timed region.
    # Timing: n decodes inside one jitted fori_loop, synced by fetching a
    # scalar — block_until_ready through the remote tunnel is unreliable
    # (.claude/skills/verify/SKILL.md).
    y = 1.0 - 2.0 * jax.random.bernoulli(key, 0.5, (batch, spec.N)).astype(
        jnp.float32)
    y = y + sigma * jax.random.normal(jax.random.fold_in(key, 1), y.shape)
    llr = (2.0 / (sigma * sigma)) * y

    @jax.jit
    def many(llr, n):
        def body(_, carry):
            cur, acc = carry
            out = decode(cur)
            s = jnp.sum(out.pm)
            return (llr + 0.0 * s, acc + s)
        return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]

    float(many(llr, 1))                    # compile
    t0 = time.perf_counter()
    float(many(llr, 1))
    base = time.perf_counter() - t0        # 1 decode + fetch overhead
    t0 = time.perf_counter()
    float(many(llr, reps + 1))
    dt = (time.perf_counter() - t0 - base) / reps
    cw_per_s = batch / dt

    target_per_chip = 1e6 / 8.0            # north-star v5e-8 => per chip
    print(json.dumps({
        "metric": "decoded_codewords_per_s_per_chip_n1024_scl8",
        "value": round(cw_per_s, 1),
        "unit": "codewords/s/chip",
        "vs_baseline": round(cw_per_s / target_per_chip, 4),
    }))


if __name__ == "__main__":
    main()
