"""Decode-throughput benchmark for any preset / decoder backend.

Timing method: n decodes chained inside one jitted `fori_loop`, synced by
fetching a scalar — `block_until_ready` through the remote TPU tunnel is
unreliable (.claude/skills/verify/SKILL.md), a value fetch is the only
trustworthy fence. One warm rep is subtracted to remove the fetch cost.

Usage:
    python benchmarks/decode_bench.py --preset ca_scl --batch 8192 \
        --backend pallas
    python benchmarks/decode_bench.py --preset mixed_scl32 --batch 512
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="ca_scl")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--backend", choices=("xla", "pallas", "fused"),
                   default="xla")
    p.add_argument("--list-size", type=int, default=None)
    p.add_argument("--llr-dtype", default="float32")
    p.add_argument("--batch-tile", type=int, default=128,
                   help="pallas backend: lanes per kernel invocation")
    p.add_argument("--big-stage", choices=("xla", "pallas"), default="xla",
                   help="xla backend: l>2 kernel-input LLR backend "
                        "(pallas = hybrid VMEM-resident stage kernels)")
    p.add_argument("--subtree", choices=("none", "pallas"), default="none",
                   help="xla backend: run each depth-1 subtree as one "
                        "Pallas mega-kernel dispatch (r4)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.models.presets import get_preset

    preset = get_preset(args.preset)
    spec = preset.spec
    L = args.list_size or preset.list_size
    if args.backend == "pallas":
        from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
        decode = build_pallas_scl_decoder(spec, L,
                                          batch_tile=args.batch_tile)
    elif args.backend == "fused":
        # full MC step (RNG+CRC+encode+AWGN+decode+count) in one kernel —
        # note this measures MORE work than the other backends' decode-only
        from polar_tpu.ops.pallas_scl import build_pallas_mc_step
        from polar_tpu.sim.channel import ebn0_to_sigma
        mc_step = build_pallas_mc_step(spec, L, batch_tile=args.batch_tile,
                                       counters=True)
        sigma = jnp.float32(ebn0_to_sigma(2.0, spec.rate))
    else:
        from polar_tpu.ops.scl import build_scl_decoder
        decode = build_scl_decoder(spec, L,
                                   llr_dtype=jnp.dtype(args.llr_dtype),
                                   big_stage_backend=args.big_stage,
                                   subtree_backend=args.subtree)

    if args.backend == "fused":
        @jax.jit
        def many(llr, n):
            def body(i, acc):
                seed = jnp.stack([jnp.int32(1) + i, jnp.int32(17)])
                fe, be, _, _ = mc_step(seed, sigma, args.batch)
                return acc + fe.astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    else:
        @jax.jit
        def many(llr, n):
            def body(_, carry):
                cur, acc = carry
                out = decode(cur)
                s = jnp.sum(out.pm)
                return (llr + 0.0 * s, acc + s)
            return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]

    B = args.batch
    llr = jax.random.normal(jax.random.key(0), (B, spec.N), jnp.float32)
    t0 = time.perf_counter()
    float(many(llr, 1))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(llr, 1))
    base = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(many(llr, args.reps + 1))
    dt = (time.perf_counter() - t0 - base) / args.reps
    print(json.dumps({
        "preset": args.preset, "backend": args.backend, "batch": B,
        "big_stage": args.big_stage if args.backend == "xla" else None,
        "subtree": args.subtree if args.backend == "xla" else None,
        # both Pallas-based backends tile the batch (ADVICE r3)
        "batch_tile": args.batch_tile if args.backend in ("pallas", "fused")
        else None,
        # fused rows time a full MC step at Eb/N0=2.0 (RNG+encode+AWGN+
        # decode+count), NOT a decode of the provided llr — don't compare
        # 1:1 with decode rows (ADVICE r3)
        "measures": "mc_step" if args.backend == "fused" else "decode",
        "list_size": L, "ms_per_decode": round(dt * 1e3, 3),
        "codewords_per_s": round(B / dt, 1),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
