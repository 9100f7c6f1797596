"""parallel/multihost.py exercised with a REAL 2-process jax.distributed
world on CPU.

The reference's equivalent is the NCCL world init its model runner performs
(reference sduss/worker/runner/_model_runner.py:324-350), which at least
runs in its serving path; until now ``initialize`` was untested anywhere.
This spawns two python processes, each calling
``multihost.initialize(coordinator, 2, i)`` on the CPU platform with 2
local devices, and runs (1) a psum over the 4-device global mesh and
(2) the REAL tiny-UNet forward GSPMD-sharded dp=2 (across hosts) x tp=2
(within each host) against the single-device reference — asserting the
engine's model path, not just a collective, works across processes.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sduss_tpu.parallel import multihost

coord, pid = sys.argv[1], int(sys.argv[2])
multihost.initialize(coord, 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

# local_replica_devices carves this host's devices into DP replicas
reps = multihost.local_replica_devices(2)
assert len(reps) == 2 and all(len(r) == 1 for r in reps)

# One global reduction across the 4-device mesh: each process's shards
# carry (process_index + 1), so the total proves the reduction saw BOTH
# processes' data (2*1 + 2*2 = 6), not just local shards (device .id is
# process-offset on multi-process CPU, so it can't seed the check).
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("dp",))
sharding = NamedSharding(mesh, P("dp"))
local = np.full((2,), float(jax.process_index() + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (4,))

@jax.jit
def total(x):
    return jnp.sum(x)

got = float(total(garr))
assert got == 6.0, got
print(f"proc {pid} OK total={got}")

# Engine-relevant leg: the REAL denoiser forward over the cross-process
# mesh (dp=2 across hosts x tp=2 within each host — the pod DP layout
# multihost.local_replica_devices documents: replicas never span hosts).
# Each process seeds identical params (replicated over the cross-host dp
# axis; tp-sharded within its own devices) and contributes its own batch
# rows; the sharded forward must match the single-device reference.
from sduss_tpu.models.unet import TINY_UNET, UNet2DConditionModel
from sduss_tpu.parallel.mesh import make_mesh
from sduss_tpu.parallel.sharding import unet_param_shardings

unet = UNet2DConditionModel(TINY_UNET)
params = unet.init(jax.random.key(0))
rng = np.random.default_rng(7)
xs = rng.standard_normal((4, 16, 16, 4)).astype(np.float32)
ehs = rng.standard_normal((4, 7, 32)).astype(np.float32)
ts = np.full((4,), 500.0, np.float32)

ref = unet.apply(params, jnp.asarray(xs), jnp.asarray(ts), jnp.asarray(ehs))
want = float(jnp.sum(ref * ref))  # sum of squares: no cancellation

mmesh = make_mesh(dp=2, tp=2)
psh = unet_param_shardings(params, mmesh)
gparams = jax.tree.map(
    lambda a, s: jax.make_array_from_process_local_data(s, np.asarray(a)),
    params, psh)
bsh = NamedSharding(mmesh, P("dp"))
gx = jax.make_array_from_process_local_data(bsh, xs[pid * 2:(pid + 1) * 2],
                                            (4, 16, 16, 4))
ge = jax.make_array_from_process_local_data(bsh, ehs[pid * 2:(pid + 1) * 2],
                                            (4, 7, 32))
gt = jax.make_array_from_process_local_data(bsh, ts[pid * 2:(pid + 1) * 2],
                                            (4,))

@jax.jit
def fwd_ss(p, x, t, e):
    out = unet.apply(p, x, t, e)
    return jnp.sum(out * out)

got_ss = float(fwd_ss(gparams, gx, gt, ge))
assert abs(got_ss - want) <= 2e-3 * abs(want) + 1e-4, (got_ss, want)
print(f"proc {pid} MODEL OK ss={got_ss:.5f}")
"""


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    # the axon sitecustomize must NOT dial the TPU relay from the workers
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, str(script), coord, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK total=6.0" in out, out[-2000:]
        assert f"proc {i} MODEL OK" in out, out[-2000:]
