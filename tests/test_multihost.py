"""Multi-host (multi-process) mesh proof — the DCN half of ICI/DCN.

Spawns 2 jax.distributed processes x 4 CPU devices each (subprocesses, so
this test process's own 8-device single-process backend is untouched) and
runs scripts/dryrun_multihost.py: dp+tp train step over the process-
spanning mesh with shard_params / per-host batch assembly, plus sharded
serving placement with per-process addressable-shard assertions.

Reference counterpart: none (single desktop process, SURVEY.md §2.8) —
this is the north-star "data-parallel across chips/hosts" obligation.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "dryrun_multihost.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_train_and_serving_placement():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # never inherit a TPU lock from the test process
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST TRAIN OK" in out, out
        assert "MULTIHOST SERVING PLACEMENT OK" in out, out
        assert "4 local / 8 global" in out, out

    # the replicated loss must agree across processes (same global
    # program over the same global batch)
    def loss_of(out):
        line = next(ln for ln in out.splitlines() if "TRAIN OK" in ln)
        return line.split("loss=")[1].split()[0]

    assert loss_of(outs[0]) == loss_of(outs[1]), outs
