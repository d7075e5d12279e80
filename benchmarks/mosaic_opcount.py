"""Post-CSE op count of the Pallas SCL mega-kernel's Mosaic module.

VERDICT r4 weak 4 / next-item 2: the trace-time tally
(`kernel_opcount.py`) overestimates executed work — bch_sc measured
*above* its whole-jaxpr bound, proving Mosaic's post-CSE schedule
executes fewer ops than the trace emits. This script pins the bound the
honest way: it intercepts the Mosaic MLIR module that pallas hands to
the TPU custom call (`jax.experimental.mosaic.lower_module_to_custom_
call`), runs MLIR `canonicalize` + `cse` on a clone (the same
redundancy-elimination class Mosaic's own pipeline starts with; the
final `apply-vector-layout` pass is only registered inside libtpu, so
true relayout costs are NOT included — stated in the output), then
walks the module and counts vector-shaped results in native-register
units (one (8,128) f32 tile = 1 register-op).

The SoL denominator is the v5e VPU's 4 register-ops/cycle @ 940 MHz =
3.67e9 reg-ops/s (same 3.85e12 elem-ops/s constant as
kernel_opcount.py, divided by the 1024-lane register).

Usage:  python benchmarks/mosaic_opcount.py [--preset ca_scl]
        [--list-size 8] [--select] [--rate R]
Runs entirely on the CPU backend (cross-platform export lowering for
"tpu"); no chip and no tunnel traffic.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_VPU_OPS = 3.85e12            # f32 element-ops/s (kernel_opcount.py)
REG_ELEMS = 8 * 128              # one native vector register (f32)

# Ops that produce vector results but are pure layout/data-movement at
# the Mosaic level: counted separately, excluded from the compute total.
LAYOUT_OPS = {
    "vector.load", "vector.store", "vector.broadcast", "vector.shape_cast",
    "vector.extract", "vector.insert", "vector.extract_strided_slice",
    "vector.insert_strided_slice", "vector.transpose",
    "tpu.memref_slice", "tpu.memref_squeeze", "tpu.reshape",
    "tpu.load", "tpu.store", "tpu.strided_load", "tpu.strided_store",
    "arith.constant", "tpu.matmul",  # matmul counted as MXU separately
}
MXU_OPS = {"tpu.matmul", "vector.contract"}


def count_module(module_op):
    """Walk a (cloned, CSE'd) module; bucket vector-register op counts."""
    from jaxlib.mlir import ir

    counts: dict = {}
    mxu_macs = 0

    def regs_of(t) -> float:
        try:
            vt = ir.VectorType(t)
        except Exception:
            return 0.0
        n = 1
        for d in vt.shape:
            n *= d
        try:
            width = ir.IntegerType(vt.element_type).width
        except Exception:
            width = 32
        # sub-32-bit vectors pack; count 32-bit register equivalents
        return n * min(width, 32) / 32 / REG_ELEMS

    def visit(op):
        nonlocal mxu_macs
        name = op.name
        r = sum(regs_of(res.type) for res in op.results)
        if name in MXU_OPS:
            # MACs: lhs [M,K] x rhs [K,N]
            try:
                lhs = ir.VectorType(op.operands[0].type).shape
                rhs = ir.VectorType(op.operands[1].type).shape
                mxu_macs += lhs[0] * lhs[1] * rhs[1]
            except Exception:
                pass
        if r > 0:
            counts[name] = counts.get(name, 0.0) + r
        return ir.WalkResult.ADVANCE

    module_op.walk(visit, walk_order=ir.WalkOrder.PRE_ORDER)
    return counts, mxu_macs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="ca_scl")
    ap.add_argument("--list-size", type=int, default=None)
    ap.add_argument("--batch-tile", type=int, default=128)
    ap.add_argument("--select", action="store_true")
    ap.add_argument("--mode", choices=["decode", "mc", "counters"],
                    default="decode")
    ap.add_argument("--rate", type=float, default=None,
                    help="measured codewords/s to score against the bound")
    ap.add_argument("--top", type=int, default=16)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from jaxlib.mlir.passmanager import PassManager

    from polar_tpu.models.presets import get_preset
    import polar_tpu.ops.pallas_scl as psc

    preset = get_preset(args.preset)
    spec = preset.spec
    P = args.list_size or preset.list_size
    BT = args.batch_tile
    mc = args.mode in ("mc", "counters")

    core, spans = psc.build_pallas_scl_kernel(
        spec, P, batch_tile=BT, select=args.select, mc=mc,
        counters=args.mode == "counters")

    captured = []
    import jax.experimental.mosaic as mosaic_mod
    import jax._src.pallas.mosaic.pallas_call_registration as pcr
    real = mosaic_mod.lower_module_to_custom_call

    def spy(ctx, *in_nodes, module, **kw):
        captured.append(module)
        return real(ctx, *in_nodes, module=module, **kw)

    pcr.mosaic.lower_module_to_custom_call = spy
    try:
        if mc:
            fn = lambda s, sg: core(s, sg, BT)
            xs = (jax.ShapeDtypeStruct((2,), jnp.int32),
                  jax.ShapeDtypeStruct((1, 1), jnp.float32))
        else:
            fn = core
            xs = (jax.ShapeDtypeStruct((BT, spec.N), jnp.float32),)
        jax.export.export(jax.jit(fn), platforms=["tpu"])(*xs)
    finally:
        pcr.mosaic.lower_module_to_custom_call = real

    assert captured, "no pallas_call lowered"
    total = {}
    mxu_total = 0
    for module in captured:
        with module.context:
            mod = module.operation.clone()
            PassManager.parse(
                "builtin.module(func.func(canonicalize), cse,"
                " func.func(canonicalize), cse)").run(mod)
            counts, macs = count_module(mod)
            mxu_total += macs
        for k, v in counts.items():
            total[k] = total.get(k, 0.0) + v

    compute = {k: v for k, v in total.items() if k not in LAYOUT_OPS}
    layout = {k: v for k, v in total.items() if k in LAYOUT_OPS}
    creg = sum(compute.values())
    lreg = sum(layout.values())
    reg_rate = V5E_VPU_OPS / REG_ELEMS          # reg-ops/s
    per_frame = creg / BT
    bound = reg_rate / max(per_frame, 1e-9)
    out = {"kind": "mosaic_opcount", "preset": args.preset,
           "list_size": P, "batch_tile": BT, "select": args.select,
           "mode": args.mode,
           "compute_reg_ops_per_tile": round(creg),
           "layout_reg_ops_per_tile": round(lreg),
           "mxu_macs_per_tile": mxu_total,
           "compute_reg_ops_per_frame": round(per_frame, 1),
           "vpu_bound_cw_s": round(bound),
           "method": "post-CSE pre-apply-vector-layout Mosaic module; "
                     "relayout/select-lowering costs not included"}
    if args.rate:
        out["measured_cw_s"] = args.rate
        out["pct_of_post_cse_sol"] = round(100 * args.rate / bound, 1)
    print(json.dumps(out), flush=True)
    print("\n-- compute ops (register units) --")
    for k, v in sorted(compute.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{k:36s} {v:>12,.0f}  {100 * v / max(creg, 1e-9):5.1f}%")
    print("\n-- layout/memory ops (register units) --")
    for k, v in sorted(layout.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{k:36s} {v:>12,.0f}")


if __name__ == "__main__":
    main()
