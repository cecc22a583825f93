"""Multi-host scaffolding: 2-process CPU smoke test (VERDICT r1 #7).

Spawns two real JAX processes (gRPC coordination, 2 virtual CPU devices
each) and runs tools/multihost_worker.py in both — the TPU-pod analogue of
the reference's torch.multiprocessing.spawn + NCCL rendezvous
(train.py:32-52)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cpu_cluster():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    # the axon sitecustomize pre-initializes a PJRT backend at interpreter
    # start, which would defeat jax.distributed.initialize — strip it
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_worker.py"),
             coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "MULTIHOST_OK" in out, \
            f"process {pid} failed:\n{out[-3000:]}"
