"""Multi-host data parallelism: 2-process CPU job (gloo collectives).

VERDICT r1 #6 / SURVEY §2.8 multi-host row: `jax.distributed.initialize`
wiring plus per-host view loading must produce the SAME step as a single
process owning all devices. The test launches two coordinator-joined child
processes with 2 local CPU devices each (a 4-device global mesh) and one
single-process 4-device reference, and compares losses and post-step
parameter checksums.
"""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={n_local_devices}",
        JAX_ENABLE_X64="0",
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    )
    return env


def _parse(proc: subprocess.CompletedProcess) -> dict:
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(
        f"no RESULT line\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )


def test_two_process_dp_step_matches_single_process():
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_multihost_child.py")
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, child, "dist", coordinator, "2", str(pid)],
            env=_child_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=420)
        assert p.returncode == 0, f"child failed:\n{stdout}\n{stderr}"
        outs.append(_parse(subprocess.CompletedProcess(p.args, 0, stdout, stderr)))

    ref_proc = subprocess.run(
        [sys.executable, child, "ref", coordinator, "1", "0"],
        env=_child_env(4), capture_output=True, text=True, timeout=420,
    )
    assert ref_proc.returncode == 0, f"ref failed:\n{ref_proc.stdout}\n{ref_proc.stderr}"
    ref = _parse(ref_proc)

    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["loss"] == pytest.approx(ref["loss"], rel=1e-4)
    for k, v in ref["checksums"].items():
        assert outs[0]["checksums"][k] == pytest.approx(
            outs[1]["checksums"][k], rel=1e-5, abs=1e-6
        ), k
        assert outs[0]["checksums"][k] == pytest.approx(v, rel=1e-3, abs=1e-5), k
