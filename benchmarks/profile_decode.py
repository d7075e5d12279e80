"""Capture a jax.profiler trace of a decode (or MC sweep step) on the
chip and print per-op time attribution (SURVEY.md §5 tracing/profiling;
VERDICT r2 items 2/4).

The xplane protobuf is parsed locally (tensorflow.tsl bundled proto) —
no TensorBoard UI needed. Events on the device planes are grouped by a
coarse category derived from the HLO/fusion name, so the output answers
"which op family eats the time": trellis min-plus, table correlations,
one-hot pgathers, top-k sorts, epilogue scan, RNG/encode/channel, ...

Usage (repo root, on the chip):
    python benchmarks/profile_decode.py --preset mixed_scl32 --batch 256
    python benchmarks/profile_decode.py --preset ca_scl --backend pallas \
        --mode harness --batch 8192
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir):
    """-> list of (plane_name, event_name, total_ps, occurrences)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    rows = []
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            agg = collections.Counter()
            cnt = collections.Counter()
            for line in plane.lines:
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    agg[name] += ev.duration_ps
                    cnt[name] += 1
            for name, ps in agg.items():
                rows.append((plane.name, name, ps, cnt[name]))
    return rows


def categorize(name):
    n = name.lower()
    if "dynamic-update-slice" in n:
        return "dyn-update-slice"
    for pat, cat in (
            ("rng", "rng"), ("sort", "sort/top_k"),
            ("reduce", "fusion:reduce"), ("scatter", "scatter"),
            ("convert", "convert"), ("copy", "copy"),
            ("transpose", "transpose"), ("broadcast", "broadcast"),
            ("concatenate", "concat"), ("dot", "matmul"),
            ("custom-call", "custom-call"), ("scan", "scan"),
            ("while", "while"), ("select", "select"),
            ("slice", "slice"), ("fusion", "fusion:elementwise")):
        if pat in n:
            return cat
    return "other"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="mixed_scl32")
    p.add_argument("--backend", choices=("xla", "pallas", "fused"),
                   default="xla")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--mode", choices=("decode", "harness"), default="decode")
    p.add_argument("--llr-dtype", default="float32")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.models.presets import get_preset

    preset = get_preset(args.preset)
    spec = preset.spec
    L = preset.list_size

    if args.backend == "fused" and args.mode != "harness":
        # the fused backend IS a full MC step — profiling it in decode
        # mode would silently fall through to the XLA decoder while being
        # labeled 'fused' (ADVICE r3)
        print("note: --backend fused implies --mode harness", flush=True)
        args.mode = "harness"
    if args.mode == "harness":
        from polar_tpu.sim.harness import make_mc_step
        from polar_tpu.sim.channel import ebn0_to_sigma
        step = make_mc_step(spec, L, steps_per_call=1, backend=args.backend)
        jstep = jax.jit(lambda key: step(key, {
            "sigma": jnp.float32(ebn0_to_sigma(2.0, spec.rate))}, args.batch))

        def run(n):
            outs = [jstep(jax.random.key(i)) for i in range(n)]
            return sum(int(o["frames"]) for o in outs)
    else:
        if args.backend == "pallas":
            from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
            decode = build_pallas_scl_decoder(spec, L)
        else:
            from polar_tpu.ops.scl import build_scl_decoder
            decode = build_scl_decoder(spec, L,
                                       llr_dtype=jnp.dtype(args.llr_dtype))
        jdec = jax.jit(lambda llr: decode(llr).pm)
        llr = jax.random.normal(jax.random.key(0), (args.batch, spec.N),
                                jnp.float32)

        def run(n):
            acc = 0.0
            for _ in range(n):
                acc += float(jnp.sum(jdec(llr)))
            return acc

    run(1)                                   # compile + warm
    logdir = args.logdir or tempfile.mkdtemp(prefix="polar_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        run(args.reps)
    wall = time.perf_counter() - t0
    print(json.dumps({"kind": "trace", "logdir": logdir,
                      "wall_s": round(wall, 3), "reps": args.reps}),
          flush=True)

    rows = parse_xplane(logdir)
    dev_rows = [r for r in rows if "TPU" in r[0] or "/device" in r[0]]
    if not dev_rows:       # fall back: everything except obvious host planes
        dev_rows = [r for r in rows if "Host" not in r[0]]
    total_ps = sum(r[2] for r in dev_rows)
    by_cat = collections.Counter()
    for _, name, ps, _ in dev_rows:
        by_cat[categorize(name)] += ps
    print(json.dumps({"kind": "categories", "total_ms": round(
        total_ps / 1e9, 2), "pct": {
            k: round(100 * v / max(total_ps, 1), 1)
            for k, v in by_cat.most_common()}}), flush=True)
    dev_rows.sort(key=lambda r: -r[2])
    for plane, name, ps, cnt in dev_rows[:args.top]:
        print(json.dumps({"kind": "op", "ms": round(ps / 1e9, 3),
                          "pct": round(100 * ps / max(total_ps, 1), 2),
                          "n": cnt, "name": name[:160]}), flush=True)


if __name__ == "__main__":
    main()
