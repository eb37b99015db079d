"""Multi-host (DCN) tests: 2 real OS processes x 4 virtual CPU devices each,
joined via jax.distributed — the CPU stand-in for a 2-host TPU pod (same
jax.distributed.initialize + global-Mesh path, DCN replaced by localhost
gRPC). Covers core/multihost.py: hybrid mesh construction, process-local
batch assembly, and a TP+DP-sharded loss whose value must agree bit-for-bit
across hosts (the psum crossed the host boundary)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_mesh():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # fresh backend per worker; deliberately NOT inheriting this process's
    # 8-device flag (the worker sets its own 4-device one)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    def parse(out, tag):
        return {
            ln.split()[1]: ln.split()[2:]
            for ln in out.splitlines()
            if ln.startswith(tag)
        }

    losses = [parse(o, "LOSS") for o in outs]
    rows = [parse(o, "ROWS") for o in outs]
    # each worker reports its own pid only
    l0 = losses[0]["0"][0]
    l1 = losses[1]["1"][0]
    assert l0 == l1, (l0, l1, outs)
    # the two processes loaded disjoint, covering row ranges
    r0 = tuple(map(int, rows[0]["0"]))
    r1 = tuple(map(int, rows[1]["1"]))
    assert r0 == (0, 2) and r1 == (2, 4), (r0, r1)
