"""2-process multi-host (DCN) test: spawns a localhost jax.distributed pair.

Closes SURVEY.md §2.10's communication-backend row beyond single-process ICI:
``init_distributed`` bootstraps a real coordination service, the (2, 4) mesh
spans both processes (the ``data`` axis rides the process/DCN boundary), and
one distributed training chunk + state gather + distributed evaluation run
with cross-process collectives. Each worker asserts against its own
single-device reference; see tests/multihost_worker.py for the payload.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_and_eval(tmp_path):
    port = _free_port()
    env = os.environ.copy()
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU plugin in the workers
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    repo = os.path.dirname(os.path.dirname(_WORKER))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # worker stdout goes to FILES, not pipes: the workers synchronize via
    # collectives, so blocking on one's pipe while the other fills its
    # buffer (verbose XLA warnings, a failure traceback) would deadlock
    # both until the timeout
    logs = [tmp_path / f"worker{pid}.log" for pid in range(2)]
    handles = [open(lg, "w") for lg in logs]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port)],
            env=env, stdout=handles[pid], stderr=subprocess.STDOUT,
            text=True, cwd=os.path.dirname(os.path.dirname(_WORKER)),
        )
        for pid in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=540)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for h in handles:
            h.close()
        pytest.fail("multihost workers timed out:\n" +
                    "\n".join(lg.read_text() for lg in logs))
    for h in handles:
        h.close()
    outs = [lg.read_text() for lg in logs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[worker {pid}] MULTIHOST PASS" in out, out
        assert f"[worker {pid}] TRAIN CHUNK OK" in out, out
        assert f"[worker {pid}] MODEL-AXIS CHUNK OK" in out, out
        assert f"[worker {pid}] DIST FIT OK" in out, out
        assert f"[worker {pid}] CKPT GUARD OK" in out, out
        assert f"[worker {pid}] DIST EVAL OK" in out, out
        assert f"[worker {pid}] DIST TOPK OK" in out, out
