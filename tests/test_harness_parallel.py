"""Monte-Carlo harness + data-parallel mesh tests on the virtual 8-device
CPU mesh (SURVEY.md §4 "Multi-host without a cluster")."""
import json
import pathlib

import jax
import numpy as np
import pytest

from polar_tpu.models.polar import CodeSpec, CrcSpec
from polar_tpu.models.presets import Preset
from polar_tpu.parallel.mesh import make_batch_mesh, sharded_mc_step
from polar_tpu.sim.harness import SweepState, make_mc_step, run_sweep, wilson_ci


def _tiny_preset(crc=True):
    from polar_tpu.construction.ga import construct_ga
    n_unfrozen = 24 if crc else 16
    mask = tuple(int(v) for v in construct_ga(64, n_unfrozen, 2.0))
    spec = CodeSpec(N=64, K=16, factors=(2,) * 6, frozen_mask=mask,
                    crc=CrcSpec(width=8, poly=0x07) if crc else None)
    return Preset("tiny", spec, 4, (1.0, 4.0), 1 << 11, 1 << 9)


@pytest.mark.slow
def test_sharded_counters_match_single_device():
    """psum'd sharded counters == single-device counters on the same keys."""
    preset = _tiny_preset()
    pdb = 64
    raw = make_mc_step(preset.spec, preset.list_size)
    mesh8 = make_batch_mesh(8)
    step8 = jax.jit(sharded_mc_step(lambda k, a: raw(k, a, pdb), mesh8))
    mesh1 = make_batch_mesh(1)
    step1 = jax.jit(sharded_mc_step(lambda k, a: raw(k, a, pdb), mesh1))
    import jax.numpy as jnp
    key = jax.random.key(7)
    out8 = step8(key, {"sigma": jnp.float32(0.9)})
    assert int(out8["frames"]) == 8 * pdb
    # single-device equivalent: sum the same 8 shard computations manually
    total = 0
    for i in range(8):
        o = raw(jax.random.fold_in(key, i), {"sigma": jnp.float32(0.9)}, pdb)
        total += int(o["frame_errors"])
    assert int(out8["frame_errors"]) == total


def test_sweep_runs_and_resumes(tmp_path):
    preset = _tiny_preset()
    mesh = make_batch_mesh(4)
    spath = tmp_path / "state.json"
    jpath = tmp_path / "out.jsonl"
    recs = run_sweep(preset, frames=1024, per_device_batch=64, mesh=mesh,
                     state_path=str(spath), jsonl_path=str(jpath),
                     progress=False)
    assert len(recs) == 2
    assert recs[0]["fer"] > recs[1]["fer"]          # 1 dB vs 4 dB
    assert recs[0]["frames"] >= 1024
    lines = [json.loads(l) for l in jpath.read_text().splitlines()]
    assert len(lines) == 2
    # resume: state file says done; rerun adds no frames
    st = SweepState.load(spath)
    recs2 = run_sweep(preset, frames=1024, per_device_batch=64, mesh=mesh,
                      state_path=str(spath), progress=False)
    st2 = SweepState.load(spath)
    assert st2.frames == st.frames and st2.rng_step == st.rng_step


def test_wilson_ci():
    lo, hi = wilson_ci(10, 1000)
    assert lo < 0.01 < hi
    assert wilson_ci(0, 0) == (0.0, 1.0)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out["frames"]) == 64


@pytest.mark.slow
def test_pallas_backend_matches_xla_counters():
    """harness backend="pallas" produces identical counters to the XLA
    backend on the same keys (both decoders are bit-identical)."""
    import jax.numpy as jnp

    preset = _tiny_preset()
    xla = make_mc_step(preset.spec, preset.list_size, backend="xla")
    pal = make_mc_step(preset.spec, preset.list_size, backend="pallas",
                       interpret=True)
    key = jax.random.key(11)
    args = {"sigma": jnp.float32(0.9)}
    o1 = jax.jit(lambda k, a: xla(k, a, 128))(key, args)
    o2 = pal(key, args, 128)
    for f in ("frames", "frame_errors", "bit_errors"):
        assert int(o1[f]) == int(o2[f]), f


def test_superbatch_counts_frames():
    """steps_per_call chains k batches per dispatch; frame accounting and
    error statistics stay consistent with the per-call path."""
    import jax.numpy as jnp

    preset = _tiny_preset()
    raw1 = make_mc_step(preset.spec, preset.list_size, steps_per_call=1)
    raw4 = make_mc_step(preset.spec, preset.list_size, steps_per_call=4)
    key = jax.random.key(3)
    out = jax.jit(lambda k, a: raw4(k, a, 128))(key, {"sigma": jnp.float32(0.9)})
    assert int(out["frames"]) == 4 * 128
    # statistically consistent FER vs the single-step path on 4x the frames
    fe1 = sum(int(jax.jit(lambda k, a: raw1(k, a, 128))(
        jax.random.fold_in(key, i), {"sigma": jnp.float32(0.9)})["frame_errors"])
        for i in range(4))
    fe4 = int(out["frame_errors"])
    assert abs(fe4 - fe1) < 0.5 * max(fe1, fe4, 20)
