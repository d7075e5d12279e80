"""Config-4 (mixed_scl32, N=4096 L=32) diagnosis: where do time and HBM go?

VERDICT r2 item 2: 295 cw/s/chip with an HBM OOM above B=256, measured
but undiagnosed. This script, on the real chip:

1. compiles the XLA decoder at B=256/512 (f32 and bf16 LLR state) and
   prints XLA's compiled memory analysis (argument/output/temp/peak) —
   the OOM diagnosis;
2. times the full decode vs the genealogy-backtrack epilogue alone
   (dummy inputs of the real shapes) — attributes front-end vs epilogue;
3. prints the decode rate for each variant that fits.

Run from repo root: python benchmarks/mixed_diag.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rate_of(fn, example, reps=2):
    import jax

    t0 = time.perf_counter()
    float(fn(example, 1))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(example, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(example, reps + 1))
    dt = (time.perf_counter() - t0 - base) / reps
    return dt, compile_s


def main():
    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.models.presets import get_preset
    from polar_tpu.ops.program import build_program
    from polar_tpu.ops.scl import build_scl_decoder, scl_epilogue

    preset = get_preset("mixed_scl32")
    spec, P = preset.spec, preset.list_size

    # ---- spans for the epilogue-only timing --------------------------
    program = build_program(spec, scl=True, classify=True, fast_r1_scl=True)
    kinds = {"R0", "REP", "R1", "SPC", "LEAF"}
    spans = [(op.t0, spec.block_sizes[op.level]) for op in program.ops
             if op.kind in kinds]
    Q = len(spans)
    print(json.dumps({"kind": "program", "n_ops": len(program.ops),
                      "traj_ops": Q}), flush=True)

    def make_many(decode):
        @jax.jit
        def many(llr, n):
            def body(_, carry):
                cur, acc = carry
                out = decode(cur)
                return (llr + 0.0 * jnp.sum(out.pm), acc + jnp.sum(out.pm))
            return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]
        return many

    for B in (256, 512):
        for dt_name, dt in (("float32", jnp.float32),
                            ("bfloat16", jnp.bfloat16)):
            decode = build_scl_decoder(spec, P, llr_dtype=dt)
            llr = jax.random.normal(jax.random.key(0), (B, spec.N),
                                    jnp.float32)
            many = make_many(decode)
            try:
                lowered = many.lower(llr, 1)
                compiled = lowered.compile()
                ma = compiled.memory_analysis()
                rec = {"kind": "memory", "B": B, "llr_dtype": dt_name}
                for f in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes", "generated_code_size_in_bytes",
                          "peak_memory_in_bytes"):
                    v = getattr(ma, f, None)
                    if v is not None:
                        rec[f.replace("_in_bytes", "_MiB")] = round(
                            v / 2**20, 1)
                print(json.dumps(rec), flush=True)
            except Exception as e:
                print(json.dumps({"kind": "memory", "B": B,
                                  "llr_dtype": dt_name,
                                  "error": str(e)[:500]}), flush=True)
                continue
            try:
                sec, compile_s = rate_of(many, llr)
                print(json.dumps({
                    "kind": "rate", "B": B, "llr_dtype": dt_name,
                    "s_per_decode": round(sec, 3),
                    "codewords_per_s": round(B / sec, 1),
                    "compile_s": round(compile_s, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"kind": "rate", "B": B,
                                  "llr_dtype": dt_name,
                                  "error": str(e)[:500]}), flush=True)

    # ---- epilogue alone at B=256 -------------------------------------
    B = 256
    key = jax.random.key(1)
    traj_bit = jax.random.bernoulli(key, 0.5, (spec.N, P, B)).astype(jnp.int8)
    perms = jax.random.randint(jax.random.fold_in(key, 1), (Q, P, B), 0, P,
                               jnp.int32)
    pm = jax.random.uniform(jax.random.fold_in(key, 2), (P, B), jnp.float32)

    @jax.jit
    def epi(traj_bit, perms, pm, n):
        def body(_, carry):
            tb, acc = carry
            entries = [(t0, nn, perms[q]) for q, (t0, nn) in enumerate(spans)]
            out = scl_epilogue(spec, P, entries, tb, pm)
            return (tb + 0 * jnp.sum(out.u).astype(jnp.int8),
                    acc + jnp.sum(out.pm))
        return jax.lax.fori_loop(0, n, body, (traj_bit, jnp.float32(0)))[1]

    def epi_fn(args, n):
        return epi(*args, n)

    sec, compile_s = rate_of(epi_fn, (traj_bit, perms, pm))
    print(json.dumps({"kind": "epilogue_rate", "B": B,
                      "s_per_call": round(sec, 3),
                      "codewords_per_s": round(B / sec, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
