"""Exact trace-time element-op count of the Pallas SCL mega-kernel.

VERDICT r3 weak 2: the roofline's "43% of VPU SoL" rested on XLA's
cost_analysis flops as a proxy for the Pallas kernel's element-ops —
where/select-dominated code is exactly where that proxy is wrong. This
script counts the kernel's real emitted element-ops instead: the kernel
helpers in ops/pallas_scl.py tally their exact per-trace op counts
(shapes are static) into `_TALLY` while the kernel traces, bucketed by
(program-op kind@level, helper). No XLA involved, no chip needed.

Usage:  python benchmarks/kernel_opcount.py [--preset ca_scl]
        [--list-size 8] [--rate R]   # R = measured cw/s to score vs SoL
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_VPU_OPS = 3.85e12        # v5e VPU f32 element-ops/s (8x128 x 4 ALUs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="ca_scl")
    ap.add_argument("--list-size", type=int, default=None)
    ap.add_argument("--batch-tile", type=int, default=128)
    ap.add_argument("--rate", type=float, default=None,
                    help="measured codewords/s to score against the bound")
    ap.add_argument("--select", action="store_true",
                    help="trace the select-mode kernel (in-kernel epilogue)")
    ap.add_argument("--mode", choices=["decode", "mc", "counters"],
                    default="decode",
                    help="decode kernel, fused-MC kernel, or fused-MC "
                    "with in-kernel counters")
    ap.add_argument("--subtree", action="store_true",
                    help="tally the depth-1 subtree kernels of a "
                    "config-4-style decode (subtree_backend='pallas') "
                    "weighted by dispatch count")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from polar_tpu.models.presets import get_preset
    import polar_tpu.ops.pallas_scl as psc

    preset = get_preset(args.preset)
    spec = preset.spec
    P = args.list_size or preset.list_size
    BT = args.batch_tile

    import numpy as np

    if args.subtree:
        # config-4 shape (VERDICT r4 item 2): the decoder is the XLA
        # outer program + one Pallas subtree kernel per depth-1 subtree
        # (ops/scl.py subtree_backend='pallas'). Tally each DISTINCT
        # subtree kernel once and weight by its dispatch count; the
        # outer stage-1 trellis DOWNs stay in XLA and are NOT in this
        # tally (stated in the output), so the bound is for the Pallas
        # side only — an upper bound on the whole decode's rate.
        from polar_tpu.models.polar import CodeSpec
        from polar_tpu.ops.program import build_program

        program = build_program(spec, scl=(P > 1), classify=True,
                                fast_r1_scl=True)
        n1 = spec.block_sizes[1]
        frozen = np.asarray(spec.frozen, bool)
        disp: dict = {}
        n_ops = len(program.ops)
        j = 0
        while j < n_ops:
            op = program.ops[j]
            if op.kind in ("DOWN_FRESH", "DOWN_DYN") and op.level == 1:
                k = j + 1
                while k < n_ops and not (
                        program.ops[k].level == 1 and
                        program.ops[k].kind in ("DOWN_FRESH", "DOWN_DYN")):
                    k += 1
                if k - j - 1 > 1:
                    fr = tuple(int(v)
                               for v in frozen[op.t0:op.t0 + n1])
                    disp[fr] = disp.get(fr, 0) + 1
                j = k
            else:
                j += 1
        total = 0
        kernels_tallied = 0
        for fr, cnt in disp.items():
            sub_spec = CodeSpec(
                N=n1, K=n1 - sum(fr), factors=spec.factors[1:],
                frozen_mask=fr, crc=None)
            psc._TALLY = {}
            try:
                sub_core, _sp = psc.build_pallas_scl_kernel(
                    sub_spec, P, batch_tile=BT, interpret=True,
                    subtree=True)
                jax.make_jaxpr(sub_core)(
                    jax.ShapeDtypeStruct((P, n1, BT), jnp.float32),
                    jax.ShapeDtypeStruct((P, BT), jnp.float32))
                sub_total = sum(psc._TALLY.get("counts", {}).values())
            finally:
                psc._TALLY = None
            total += cnt * sub_total
            kernels_tallied += 1
        per_frame = total / BT
        bound = V5E_VPU_OPS / max(per_frame, 1)
        print(json.dumps({
            "kind": "opcount_subtree", "preset": args.preset,
            "list_size": P, "batch_tile": BT,
            "distinct_subtree_kernels": kernels_tallied,
            "dispatches": sum(disp.values()),
            "elem_ops_per_frame": round(per_frame),
            "pallas_side_vpu_bound_cw_s": round(bound),
            "note": "outer XLA stage-1 trellis DOWNs excluded — this "
                    "bounds the Pallas side only"}), flush=True)
        if args.rate:
            print(json.dumps({
                "kind": "opcount_sol", "measured_cw_s": args.rate,
                "pct_of_pallas_side_bound":
                round(100 * args.rate / bound, 1)}), flush=True)
        return

    psc._TALLY = {}
    try:
        mc = args.mode in ("mc", "counters")
        core, spans = psc.build_pallas_scl_kernel(
            spec, P, batch_tile=BT, interpret=True, select=args.select,
            mc=mc, counters=args.mode == "counters")
        if mc:
            jaxpr = jax.make_jaxpr(
                lambda s, sg: core(s, sg, BT))(
                jax.ShapeDtypeStruct((2,), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32))
        else:
            jaxpr = jax.make_jaxpr(core)(
                jax.ShapeDtypeStruct((BT, spec.N), jnp.float32))
        counts = dict(psc._TALLY.get("counts", {}))
    finally:
        psc._TALLY = None

    # Complementary universal count straight from the traced kernel
    # jaxpr: output elements of every non-layout primitive. Catches work
    # the helper tally does not instrument (down_big trellis/table paths,
    # the MC prologue) at the cost of also counting copies.
    FREE = {"reshape", "squeeze", "broadcast_in_dim"}
    jx_elems = 0
    for eq in jaxpr.jaxpr.eqns:
        if eq.primitive.name != "pallas_call":
            continue
        for e in eq.params["jaxpr"].eqns:
            if e.primitive.name in FREE:
                continue
            for ov in e.outvars:
                if hasattr(ov.aval, "shape"):
                    jx_elems += (int(np.prod(ov.aval.shape))
                                 if ov.aval.shape else 1)

    total = sum(counts.values())
    by_helper, by_ctx = {}, {}
    for (ctx, helper), n in counts.items():
        by_helper[helper] = by_helper.get(helper, 0) + n
        by_ctx[ctx] = by_ctx.get(ctx, 0) + n

    per_frame = total / BT
    bound = V5E_VPU_OPS / max(per_frame, 1)
    jx_frame = jx_elems / BT
    print(json.dumps({"kind": "opcount_total", "preset": args.preset,
                      "list_size": P, "batch_tile": BT,
                      "elem_ops_per_tile": total,
                      "elem_ops_per_frame": round(per_frame),
                      "vpu_bound_cw_s": round(bound),
                      "jaxpr_elems_per_frame": round(jx_frame),
                      "jaxpr_vpu_bound_cw_s":
                      round(V5E_VPU_OPS / max(jx_frame, 1))}), flush=True)
    if args.rate:
        print(json.dumps({"kind": "opcount_sol", "measured_cw_s": args.rate,
                          "pct_of_vpu_sol":
                          round(100 * args.rate / bound, 1)}), flush=True)
    print("\n-- by helper --")
    for h, n in sorted(by_helper.items(), key=lambda kv: -kv[1]):
        print(f"{h:16s} {n:>14,d}  {100 * n / total:5.1f}%")
    print("\n-- by program-op kind (top) --")
    agg = {}
    for ctx, n in by_ctx.items():
        kind = ctx.split("@")[0]
        agg[kind] = agg.get(kind, 0) + n
    for c, n in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{c:16s} {n:>14,d}  {100 * n / total:5.1f}%")
    print("\n-- top (kind@level, helper) buckets --")
    for (ctx, h), n in sorted(counts.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ctx:16s} {h:14s} {n:>14,d}  {100 * n / total:5.1f}%")


if __name__ == "__main__":
    main()
