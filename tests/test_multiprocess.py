"""Multi-host simulation without a cluster (SURVEY.md §4): two OS processes
join via jax.distributed on the CPU backend (4 virtual devices each -> an
8-device global mesh), run the sharded Monte-Carlo step, and the psum'd
counters must equal the sum of the per-shard computations."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]))
import jax.numpy as jnp
from polar_tpu.construction.ga import construct_ga
from polar_tpu.models.polar import CodeSpec
from polar_tpu.parallel.mesh import make_batch_mesh, sharded_mc_step
from polar_tpu.sim.harness import make_mc_step

mask = tuple(int(v) for v in construct_ga(32, 16, 2.0))
spec = CodeSpec(N=32, K=16, factors=(2,)*5, frozen_mask=mask)
pdb = 32
raw = make_mc_step(spec, 2)
mesh = make_batch_mesh()          # all 8 global devices
step = jax.jit(sharded_mc_step(lambda k, a: raw(k, a, pdb), mesh))
out = step(jax.random.key(3), {"sigma": jnp.float32(0.9)})
if jax.process_index() == 0:
    print(json.dumps({
        "n_devices": jax.device_count(),
        "frames": int(out["frames"]),
        "frame_errors": int(out["frame_errors"]),
        "bit_errors": int(out["bit_errors"]),
    }), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.getcwd()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    rec = json.loads(outs[0][0].strip().splitlines()[-1])
    assert rec["n_devices"] == 8
    assert rec["frames"] == 8 * 32

    # cross-check the psum against a single-process recomputation of the
    # same 8 shards (fold_in(key, axis_index) per shard)
    import jax
    import jax.numpy as jnp
    from polar_tpu.construction.ga import construct_ga
    from polar_tpu.models.polar import CodeSpec
    from polar_tpu.sim.harness import make_mc_step

    mask = tuple(int(v) for v in construct_ga(32, 16, 2.0))
    spec = CodeSpec(N=32, K=16, factors=(2,) * 5, frozen_mask=mask)
    raw = make_mc_step(spec, 2)
    total_fe = 0
    for i in range(8):
        o = raw(jax.random.fold_in(jax.random.key(3), i),
                {"sigma": jnp.float32(0.9)}, 32)
        total_fe += int(o["frame_errors"])
    assert rec["frame_errors"] == total_fe
