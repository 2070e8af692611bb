"""Multi-host training smoke: 2 coordinated processes x 4 virtual CPU devices
run the FSDP x TP train step over ONE global 8-device mesh (cross-process
collectives ride Gloo) and must agree with the single-process 8-device run
bit-for... well, float-for-float."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_process(pid: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    # the subprocess must see exactly 4 local devices (the parent test env
    # forces 8 via conftest's XLA_FLAGS — override, don't inherit)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [
            sys.executable, "-m", "tokenpacker_tpu.parallel.multihost",
            "--coordinator", f"localhost:{port}",
            "--num-processes", "2",
            "--process-id", str(pid),
            "--cpu-local-devices", "4",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )


def _loss_from(out: str) -> float:
    m = re.search(r"multihost_dryrun: pid=\d+/2 .* loss=([0-9.]+) OK", out)
    assert m, f"no loss line in output:\n{out[-3000:]}"
    return float(m.group(1))


def test_two_process_train_step_matches_single_process():
    from tokenpacker_tpu.parallel.multihost import run_dryrun

    expected = run_dryrun(tp=2)  # single process, 8 local devices (conftest)

    port = _free_port()
    procs = [_run_process(0, port), _run_process(1, port)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost subprocess timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    losses = [_loss_from(o) for o in outs]
    assert losses[0] == losses[1]
    assert abs(losses[0] - expected) < 1e-5, (losses, expected)
