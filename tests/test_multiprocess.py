"""True multi-process SPMD proof: 2 processes x 4 CPU devices.

Everything else in the suite runs on a single-process virtual mesh; this
test crosses a real process boundary via jax.distributed.initialize —
validating that (1) the quantized TP+DP train step compiles and executes
when the mesh spans processes, and (2) the ContinuousBatcher's
deterministic-admission contract holds: both processes independently
replay identical admission schedules, completion orders, and results
(pipeline/batching.py:11-19; BASELINE north star "batching across
hosts").
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_spmd():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",      # skip axon TPU registration
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": root,
    })
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "_mp_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=root, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, stderr[-4000:]
        line = [ln for ln in stdout.splitlines()
                if ln.startswith("MPRESULT ")]
        assert line, (stdout[-2000:], stderr[-2000:])
        outs.append(json.loads(line[-1][len("MPRESULT "):]))

    a, b = outs
    assert a["pid"] == 0 and b["pid"] == 1
    assert a["ndev"] == b["ndev"] == 8      # global device view everywhere

    # the train step produced the same finite loss on both processes
    assert a["loss"] == b["loss"]
    assert a["loss"] == a["loss"]  # not NaN

    # deterministic admission: identical schedule, order, and results
    assert a["admissions"] == b["admissions"]
    assert a["completed"] == b["completed"]
    assert a["digests"] == b["digests"]
    assert a["efficiency"] == b["efficiency"] > 0.5
    assert len(a["completed"]) == 24        # every request drained
