"""Monte-Carlo BER/FER harness: Eb/N0 sweep, sharded batches, resume.

TPU-native equivalent of the reference's C++ main()/simulate() loop
(SURVEY.md C12/L7, §3.1; BASELINE.json:5,11). Differences by design:

- The per-codeword loop becomes one jitted SPMD step over a device mesh:
  random info -> CRC -> encode -> BPSK-AWGN -> LLR -> decode -> error
  counters, all batched; per-shard counters are psum'd (parallel.mesh).
- The SNR loop stays on the host (8-point grid [B:11]).
- Sweep state (per-SNR frame/error counters + RNG step) persists to JSON
  after every super-batch, so a killed sweep resumes losslessly
  (SURVEY.md §5 "checkpoint/resume").
- Results stream to stdout and JSONL (SURVEY.md §5 metrics/logging).
"""
from __future__ import annotations

import dataclasses
import json
import math
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from polar_tpu.models.polar import CodeSpec
from polar_tpu.models.presets import Preset
from polar_tpu.ops.crc import crc_append
from polar_tpu.ops.encode import encode
from polar_tpu.ops.scl import build_scl_decoder
from polar_tpu.parallel.mesh import make_batch_mesh, sharded_mc_step
from polar_tpu.sim.channel import ebn0_to_sigma


def make_mc_step(spec: CodeSpec, list_size: int, steps_per_call: int = 1,
                 backend: str = "xla", interpret: bool = False,
                 big_stage_backend: str = "xla"):
    """Per-shard Monte-Carlo step: key, (sigma,) -> counter dict.

    steps_per_call > 1 chains that many independent batches inside one
    jitted call (`fori_loop`, key folded per sub-step) — one host dispatch
    + one counter fetch per superbatch instead of per batch. The host
    round-trip dominates at TPU decode rates (~100 ms through the remote
    tunnel vs ~24 ms of decode at B=8192).

    backend: "xla" (ops/scl.py unrolled program) or "pallas" (VMEM-resident
    mega-kernel, ops/pallas_scl.py; batch must be a multiple of its 128-lane
    tile). Both are bit-identical — the knob trades compile time for rate.
    "fused" additionally moves RNG/CRC/encode/channel INTO the kernel
    (build_pallas_mc_step): the fastest path; decode is bit-identical but
    the PRNG stream differs (pltpu hardware PRNG vs threefry), so its FER
    is statistically — not per-frame — equal to the other backends.
    interpret runs the Pallas kernel in interpreter mode (CPU tests only)."""
    if backend == "pallas":
        from polar_tpu.ops.pallas_scl import build_pallas_scl_decoder
        decode = build_pallas_scl_decoder(spec, list_size,
                                          interpret=interpret)
    elif backend == "fused":
        from polar_tpu.ops.pallas_scl import build_pallas_mc_step
        mc_kernel_step = build_pallas_mc_step(spec, list_size,
                                              interpret=interpret,
                                              counters=True)
    elif backend == "xla":
        decode = build_scl_decoder(spec, list_size,
                                   big_stage_backend=big_stage_backend,
                                   pallas_interpret=interpret)
    else:
        raise ValueError(f"unknown decode backend {backend!r}")
    K = spec.K

    def one(key, sigma, batch: int):
        if backend == "fused":
            # whole MC step in one Pallas kernel (RNG/encode/channel/
            # decode VMEM-resident); TWO 32-bit seed words derived from
            # the step key (a single word birthday-collides across long
            # sweeps, ADVICE r3) — resume determinism is preserved
            seed = jax.random.bits(key, (2,), jnp.uint32).astype(jnp.int32)
            fe, be, _, _ = mc_kernel_step(seed, sigma, batch)
            return fe.astype(jnp.int32), be.astype(jnp.int32)
        k_info, k_noise = jax.random.split(key)
        info = jax.random.bernoulli(k_info, 0.5, (batch, K)).astype(jnp.int8)
        payload = crc_append(spec.crc, info) if spec.crc is not None else info
        x = encode(spec, payload)
        y = (1.0 - 2.0 * x.astype(jnp.float32)) + sigma * jax.random.normal(
            k_noise, x.shape, jnp.float32)
        llr = 2.0 * y / (sigma * sigma)
        out = decode(llr)
        got = out.payload[:, :K]
        bit_err = jnp.sum(got != info)
        frame_err = jnp.sum(jnp.any(got != info, axis=1))
        return (frame_err.astype(jnp.int32), bit_err.astype(jnp.int32))

    def step(key, args, batch: int):
        sigma = args["sigma"]
        if steps_per_call == 1:
            fe, be = one(key, sigma, batch)
        else:
            def body(i, acc):
                fe, be = one(jax.random.fold_in(key, i), sigma, batch)
                return (acc[0] + fe, acc[1] + be)

            fe, be = jax.lax.fori_loop(
                0, steps_per_call, body,
                (jnp.int32(0), jnp.int32(0)))
        return {
            "frames": jnp.asarray(batch * steps_per_call, jnp.int32),
            "frame_errors": fe,
            "bit_errors": be,
        }

    return step


def wilson_ci(errors: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson score interval for the FER estimate."""
    if n == 0:
        return (0.0, 1.0)
    p = errors / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


@dataclasses.dataclass
class SweepState:
    """Resumable per-sweep counters, persisted as JSON."""
    preset: str
    snr_db: list[float]
    frames: list[int]
    frame_errors: list[int]
    bit_errors: list[int]
    rng_step: list[int]
    seed: int

    @classmethod
    def fresh(cls, name: str, grid, seed: int) -> "SweepState":
        n = len(grid)
        return cls(name, [float(s) for s in grid], [0] * n, [0] * n,
                   [0] * n, [0] * n, seed)

    def save(self, path: pathlib.Path) -> None:
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(dataclasses.asdict(self)))
        tmp.replace(path)

    @classmethod
    def load(cls, path: pathlib.Path) -> "SweepState":
        return cls(**json.loads(path.read_text()))


def run_sweep(preset: Preset, frames: int | None = None,
              per_device_batch: int | None = None, seed: int = 0,
              mesh=None, state_path: str | None = None,
              jsonl_path: str | None = None, min_frame_errors: int = 0,
              progress: bool = True, steps_per_call: int = 1,
              backend: str = "xla", interpret: bool = False,
              big_stage_backend: str = "xla",
              pipeline_depth: int = 2) -> list[dict]:
    """Run the Monte-Carlo FER sweep for a preset. Returns per-SNR records.

    min_frame_errors: optional early-stop once a SNR point has this many
    frame errors AND at least frames/10 frames (bounded-relative-error MC).

    pipeline_depth: number of super-batches kept in flight before the
    host fetches counters. JAX dispatch is async; fetching a step's
    counters immediately serializes every host->device round-trip
    (~100 ms through the remote TPU tunnel) with the device compute.
    Keeping `pipeline_depth` dispatches outstanding overlaps the
    round-trip with decode (VERDICT r2 item 4). Counters are fetched (and
    sweep state persisted) strictly in dispatch order, so resume
    semantics are unchanged; 1 restores the fetch-every-step behavior.
    """
    mesh = mesh or make_batch_mesh()
    n_dev = mesh.devices.size
    frames = frames or preset.frames
    pdb = per_device_batch or max(1, preset.batch // n_dev)
    global_batch = pdb * n_dev

    raw_step = make_mc_step(preset.spec, preset.list_size,
                            steps_per_call=steps_per_call, backend=backend,
                            interpret=interpret,
                            big_stage_backend=big_stage_backend)
    if n_dev == 1:
        # single chip: no collective needed — and the axon remote-TPU
        # plugin hangs on shard_map/psum, so don't route through it
        step = jax.jit(lambda key, args: raw_step(
            jax.random.fold_in(key, 0), args, pdb))
    else:
        step = jax.jit(sharded_mc_step(
            lambda key, args: raw_step(key, args, pdb), mesh))

    state = None
    spath = pathlib.Path(state_path) if state_path else None
    if spath and spath.exists():
        state = SweepState.load(spath)
        if state.preset != preset.name or state.snr_db != [float(s) for s in
                                                          preset.ebn0_grid]:
            state = None
    if state is None:
        state = SweepState.fresh(preset.name, preset.ebn0_grid, seed)

    records = []
    jfile = open(jsonl_path, "a") if jsonl_path else None
    for si, snr in enumerate(state.snr_db):
        sigma = float(ebn0_to_sigma(snr, preset.spec.rate))
        key = jax.random.fold_in(jax.random.key(state.seed), si)
        t0 = time.time()
        t_frames = 0
        # steady-state rate: the first fetch includes the one-time
        # compile (~40 s warm disk cache for the Pallas flagship), so the
        # rate clock starts when the first super-batch lands and excludes
        # its frames
        t_rate = None
        f_rate = 0
        frames_per_call = global_batch * steps_per_call
        pending: list = []     # dispatched-but-unfetched outs, FIFO

        def fetch_one():
            nonlocal t_frames, t_rate, f_rate
            # one device_get for the whole counter dict: three serial
            # int() fetches cost ~100 ms of extra tunnel round-trips per
            # super-batch (306k -> 581k cw/s measured on chip, r3)
            out = jax.device_get(pending.pop(0))
            state.rng_step[si] += 1
            state.frames[si] += int(out["frames"])
            state.frame_errors[si] += int(out["frame_errors"])
            state.bit_errors[si] += int(out["bit_errors"])
            t_frames += int(out["frames"])
            if t_rate is None:
                t_rate = time.time()
                f_rate = t_frames
            if spath:
                state.save(spath)

        while True:
            done = state.frames[si] + len(pending) * frames_per_call
            early = (min_frame_errors and
                     state.frame_errors[si] >= min_frame_errors and
                     state.frames[si] >= frames // 10)
            if done >= frames or early:
                break
            pending.append(step(
                jax.random.fold_in(key, state.rng_step[si] + len(pending)),
                {"sigma": jnp.float32(sigma)}))
            if len(pending) >= max(1, pipeline_depth):
                fetch_one()
        while pending:
            fetch_one()
        dt = max(time.time() - t0, 1e-9)
        if t_rate is not None and t_frames > f_rate:
            rate = (t_frames - f_rate) / max(time.time() - t_rate, 1e-9)
        else:
            rate = t_frames / dt if t_frames else None
        n, fe, be = state.frames[si], state.frame_errors[si], state.bit_errors[si]
        lo, hi = wilson_ci(fe, n)
        rec = {
            "preset": preset.name, "ebn0_db": snr, "frames": n,
            "frame_errors": fe, "bit_errors": be,
            "fer": fe / max(n, 1), "ber": be / max(n * preset.spec.K, 1),
            "fer_ci95": [lo, hi],
            "codewords_per_s": rate,
            "n_devices": n_dev, "global_batch": global_batch,
        }
        records.append(rec)
        if progress:
            print(json.dumps(rec), flush=True)
        if jfile:
            jfile.write(json.dumps(rec) + "\n")
            jfile.flush()
    if jfile:
        jfile.close()
    return records
