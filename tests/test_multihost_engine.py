"""The ENGINE itself on a real 2-process jax.distributed CPU world.

tests/test_multihost.py proves the model forward works GSPMD-sharded across
processes; this runs the full serving stack — Engine -> Worker -> pipeline ->
sampler -> VAE -> postprocess — inside each process of a 2-host world (one
engine process per host, DP replicas on that host's local devices, the pod
layout parallel/multihost.py documents), and asserts every request's output
image matches a single-host engine run bit-for-bit at the uint8 boundary.

The engine change under test: replica placement and memory queries use
``jax.local_devices()`` (addressable), never the pod-global ``jax.devices()``
— placing a replica on another host's device raises in a multi-process world.

Reference analog: its engine is single-node only (NCCL world over
tcp://localhost, sduss/worker/runner/_model_runner.py:324-350); this is
beyond-parity scale-out evidence.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax

from sduss_tpu.parallel import multihost

coord, pid, ref_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
multihost.initialize(coord, 2, pid)
assert jax.process_count() == 2
assert jax.device_count() == 4
assert len(jax.local_devices()) == 2

from sduss_tpu.config import Config, ModelConfig
from sduss_tpu.engine.engine import Engine
from sduss_tpu.request import SamplingParams

config = Config()
config.model = ModelConfig(model="sd15", test_tiny=True)
config.parallel.dp = 2  # one replica per LOCAL device; replicas never span hosts

engine = Engine(config)
for w in engine.workers:
    dev = w.pipeline.device
    assert dev is not None and dev in jax.local_devices(), (
        f"replica placed on non-addressable device {dev}")

# This host serves ITS OWN two requests (a front-end shards requests across
# host engines; seeds/prompts fixed so the single-host reference is exact).
mine = []
for i in range(2):
    rid = f"h{pid}-{i}"
    mine.append(rid)
    engine.add_request(rid, SamplingParams(
        prompt=f"multihost parity {pid} {i}", resolution=64,
        num_inference_steps=4, seed=100 + 2 * pid + i, output_type="np"))

outs = {}
while engine.has_unfinished_requests():
    for out in engine.step():
        outs[out.request_id] = out

ref = np.load(ref_path)
for rid in mine:
    out = outs[rid]
    assert out.finished and not out.aborted and out.error is None, vars(out)
    got = np.asarray(out.image, np.int16)
    want = np.asarray(ref[rid], np.int16)
    assert got.shape == want.shape, (got.shape, want.shape)
    diff = int(np.abs(got - want).max())
    # uint8 quantization absorbs float noise; allow one LSB of rounding
    assert diff <= 1, f"{rid}: max abs uint8 diff {diff}"
    print(f"proc {pid} req {rid} OK maxdiff={diff}")
print(f"proc {pid} ENGINE OK")
"""


@pytest.mark.slow
def test_engine_two_process_parity(tmp_path):
    # Single-host reference: same four requests, one engine, one device,
    # drained one at a time (b1 batches — the same batch shape each request
    # sees under dp=2 with two requests per host).
    import jax

    from sduss_tpu.config import Config, ModelConfig
    from sduss_tpu.engine.engine import Engine
    from sduss_tpu.request import SamplingParams

    config = Config()
    config.model = ModelConfig(model="sd15", test_tiny=True)
    config.parallel.dp = 1
    engine = Engine(config, devices=[jax.devices()[0]])
    ref = {}
    for pid in range(2):
        for i in range(2):
            rid = f"h{pid}-{i}"
            engine.add_request(rid, SamplingParams(
                prompt=f"multihost parity {pid} {i}", resolution=64,
                num_inference_steps=4, seed=100 + 2 * pid + i,
                output_type="np"))
            while engine.has_unfinished_requests():
                for out in engine.step():
                    assert out.finished and out.error is None, vars(out)
                    ref[out.request_id] = np.asarray(out.image)
    assert len(ref) == 4
    ref_path = tmp_path / "ref.npz"
    np.savez(ref_path, **ref)

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
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i), str(ref_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} ENGINE OK" in out, out[-2000:]
