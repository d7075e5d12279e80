"""Speed-of-light / roofline analysis of the flagship Pallas decode.

BASELINE.json north star: "LLR-update and kernel-trellis stages at
per-chip speed-of-light"; SURVEY.md §4 "roofline check of the LLR-update
kernel". This script quantifies where the decode sits against the v5e
per-chip bounds:

- HBM bound: exact per-codeword HBM traffic of the Pallas kernel is just
  its in/out tensors (all decode state lives in VMEM scratch):
      in  llr      N * 4 B
      out traj_bit N * P * 1 B
      out traj_perm Q * P * 4 B
      out pm       P * 4 B
  plus the XLA epilogue's backtrack (reads traj_* once more, writes u).
- Compute bound: per-codeword arithmetic work, taken from XLA's own cost
  analysis of the bit-identical XLA-backend program (the Pallas kernel
  evaluates the same expression DAG op-for-op, see ops/pallas_scl.py),
  scored against the v5e VPU peak (8x128 lanes x 4 ALUs x ~0.94 GHz
  ~= 3.85e12 f32 elem-ops/s; the decode does no MXU work).

Also prints the exact VMEM scratch footprint per batch tile — the
batch_tile=256 diagnosis (VERDICT r1 item 4).

Run from repo root on the chip: python benchmarks/roofline.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBS = 819.0          # v5e HBM bandwidth, GB/s
V5E_VPU_OPS = 3.85e12        # v5e VPU f32 element-ops/s (8x128 x 4 ALUs)
VMEM_BYTES = 16 * 2**20      # VMEM per core (pallas_guide.md: ~16 MB)


def main():
    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.models.presets import get_preset
    from polar_tpu.ops.pallas_scl import build_pallas_scl_kernel, \
        build_pallas_scl_decoder, vmem_footprint
    from polar_tpu.ops.scl import build_scl_decoder
    from polar_tpu.sim.channel import ebn0_to_sigma

    preset = get_preset(os.environ.get("ROOFLINE_PRESET", "ca_scl"))
    spec, P = preset.spec, preset.list_size
    B = int(os.environ.get("ROOFLINE_BATCH", "8192"))
    reps = int(os.environ.get("ROOFLINE_REPS", "8"))

    _, spans = build_pallas_scl_kernel(spec, P)
    Q = len(spans)

    # --- static analysis -------------------------------------------------
    for bt in (128, 256):
        fp = vmem_footprint(spec, P, bt, Q)
        print(json.dumps({"kind": "vmem_footprint", "batch_tile": bt,
                          **{k: round(v / 2**20, 2) for k, v in fp.items()},
                          "unit": "MiB",
                          "fits_vmem": fp["total"] < VMEM_BYTES}),
              flush=True)

    hbm_per_cw = (spec.N * 4 + spec.N * P + Q * P * 4 + P * 4)
    # epilogue backtrack reads traj_* once and writes u [N] i8 + payload;
    # plus the host-side llrs.T transpose in the Pallas core (an extra
    # N*4 B write + read of the transposed copy) — ADVICE r2.
    hbm_per_cw_total = (hbm_per_cw + (spec.N * P + Q * P * 4) + spec.N
                        + 2 * spec.N * 4)

    sigma = float(ebn0_to_sigma(2.0, spec.rate))
    key = jax.random.key(0)
    y = 1.0 - 2.0 * jax.random.bernoulli(key, 0.5, (B, spec.N)).astype(
        jnp.float32)
    y = y + sigma * jax.random.normal(jax.random.fold_in(key, 1), y.shape)
    llr = (2.0 / (sigma * sigma)) * y

    # --- XLA cost analysis of the bit-identical XLA-backend program ------
    dec_xla = build_scl_decoder(spec, P)
    fn = jax.jit(lambda x: dec_xla(x).u)
    compiled = fn.lower(llr).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_cw = float(ca.get("flops", 0.0)) / B
    bytes_cw_xla = float(ca.get("bytes accessed", 0.0)) / B
    print(json.dumps({"kind": "xla_cost_analysis", "batch": B,
                      "flops_per_cw": round(flops_cw),
                      "hbm_bytes_per_cw": round(bytes_cw_xla)}), flush=True)

    # --- measured rates (n decodes in one jitted fori_loop, scalar sync) -
    def rate_of(decode):
        @jax.jit
        def many(llr, n):
            def body(_, carry):
                cur, acc = carry
                out = decode(cur)
                s = jnp.sum(out.pm)
                return (llr + 0.0 * s, acc + s)
            return jax.lax.fori_loop(0, n, body, (llr, jnp.float32(0)))[1]
        float(many(llr, 1))
        t0 = time.perf_counter()
        float(many(llr, reps))
        dt = time.perf_counter() - t0
        return B * reps / dt

    results = {}
    for name, build in (("pallas", build_pallas_scl_decoder),
                        ("xla", build_scl_decoder)):
        r = rate_of(build(spec, P))
        results[name] = r
        # Per-backend HBM accounting (VERDICT r2 weak 2): the XLA backend's
        # traffic is what XLA's cost analysis says it moves (every fusion
        # round-trips HBM); the Pallas kernel's traffic is only its in/out
        # tensors + epilogue + transpose (state lives in VMEM).
        hbm_cw = hbm_per_cw_total if name == "pallas" else bytes_cw_xla
        row = {
            "kind": "roofline", "backend": name, "batch": B,
            "codewords_per_s": round(r),
            "hbm_bytes_per_cw": round(hbm_cw),
            "achieved_hbm_GBs": round(r * hbm_cw / 1e9, 2),
            "hbm_bound_cw_s": round(V5E_HBM_GBS * 1e9 / hbm_cw),
            "pct_of_hbm_sol": round(
                100 * r * hbm_cw / (V5E_HBM_GBS * 1e9), 2),
        }
        if flops_cw > 0:                      # ADVICE r2: guard missing key
            row.update({
                "achieved_vpu_ops": round(r * flops_cw / 1e12, 3),
                "vpu_bound_cw_s": round(V5E_VPU_OPS / flops_cw),
                "pct_of_vpu_sol": round(100 * r * flops_cw / V5E_VPU_OPS, 1),
            })
        else:
            row["vpu_note"] = "xla cost analysis reported no flops key"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
