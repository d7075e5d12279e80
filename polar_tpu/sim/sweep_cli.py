"""CLI entry point for Monte-Carlo FER sweeps — the reference's `main`.

TPU-native equivalent of the reference C++ executable's argv interface
(SURVEY.md C12/L7; config system per SURVEY.md §5). Usage:

    python -m polar_tpu.sim.sweep_cli --preset ca_scl \
        --frames 1000000 --state sweep_state.json --jsonl results.jsonl

Multi-host: launch one process per host with JAX_COORDINATOR_ADDRESS set;
batches shard over every chip in the slice and counters cross hosts via
psum (parallel.mesh).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="ca_scl",
                   help="named preset (see polar_tpu.models.presets)")
    p.add_argument("--frames", type=int, default=None,
                   help="frames per SNR point (default: preset value)")
    p.add_argument("--per-device-batch", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--snr", type=float, nargs="*", default=None,
                   help="override the Eb/N0 grid (dB)")
    p.add_argument("--list-size", type=int, default=None,
                   help="override the preset list size")
    p.add_argument("--state", default=None, help="resumable state JSON path")
    p.add_argument("--jsonl", default=None, help="append results here")
    p.add_argument("--min-frame-errors", type=int, default=0,
                   help="early-stop a point after this many frame errors")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="batches chained per device dispatch (amortizes "
                        "the host round-trip; see harness.make_mc_step)")
    p.add_argument("--backend", choices=("xla", "pallas", "fused"),
                   default="xla",
                   help="decoder backend: pallas = VMEM-resident mega-"
                        "kernel (ops/pallas_scl.py), ~2x the XLA rate; "
                        "fused = the whole MC step (RNG/encode/channel/"
                        "decode) in one Pallas kernel — fastest; FER-"
                        "equivalent but a different PRNG stream than "
                        "xla/pallas")
    p.add_argument("--big-stage", choices=("xla", "pallas"), default="xla",
                   help="xla backend: l>2 kernel-input LLR backend "
                        "(pallas = hybrid VMEM-resident stage kernels, "
                        "the fast path for mixed/BCH configs)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="super-batches in flight before fetching counters "
                        "(overlaps the host round-trip with decode; "
                        "1 = fetch every step)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the steady-state "
                        "sweep into DIR (view with XProf/Perfetto)")
    args = p.parse_args(argv)

    from polar_tpu.utils.compilecache import enable
    enable()

    from polar_tpu.parallel.mesh import init_multihost
    init_multihost()

    import dataclasses
    from polar_tpu.models.presets import get_preset
    preset = get_preset(args.preset)
    if args.snr:
        preset = dataclasses.replace(preset, ebn0_grid=tuple(args.snr))
    if args.list_size:
        preset = dataclasses.replace(preset, list_size=args.list_size)

    from polar_tpu.sim.harness import run_sweep
    if args.profile:
        # tracing/profiling subsystem (SURVEY.md §5): warm up one tiny
        # sweep to compile, then trace the steady state
        import jax

        run_sweep(preset, frames=1, per_device_batch=args.per_device_batch,
                  seed=args.seed, progress=False,
                  steps_per_call=args.steps_per_call, backend=args.backend,
                  big_stage_backend=args.big_stage,
                  pipeline_depth=args.pipeline_depth)
        with jax.profiler.trace(args.profile):
            recs = run_sweep(preset, frames=args.frames,
                             per_device_batch=args.per_device_batch,
                             seed=args.seed, jsonl_path=args.jsonl,
                             state_path=args.state,
                             min_frame_errors=args.min_frame_errors,
                             steps_per_call=args.steps_per_call,
                             backend=args.backend,
                             big_stage_backend=args.big_stage,
                             pipeline_depth=args.pipeline_depth)
    else:
        recs = run_sweep(preset, frames=args.frames,
                         per_device_batch=args.per_device_batch,
                         seed=args.seed,
                         state_path=args.state, jsonl_path=args.jsonl,
                         min_frame_errors=args.min_frame_errors,
                         steps_per_call=args.steps_per_call,
                         backend=args.backend,
                         big_stage_backend=args.big_stage,
                         pipeline_depth=args.pipeline_depth)
    print(json.dumps({"summary": [
        {"ebn0_db": r["ebn0_db"], "fer": r["fer"], "ber": r["ber"],
         "frames": r["frames"]} for r in recs]}))


if __name__ == "__main__":
    main()
