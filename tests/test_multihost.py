"""2-process ``jax.distributed`` CPU test for the multihost mesh.

``make_multihost_mesh``'s DCN-axis claim cannot be proven on one host, but
its *mechanics* can: two OS processes with 4 virtual CPU devices each form
the (dcn=2, data=2, model=2) global mesh, plan a batch sharded over
``(dcn, data)`` through ``gn.plan`` under GSPMD with Gloo cross-process
collectives, and must reproduce the unsharded trajectories
(tests/_multihost_child.py).  SURVEY.md §5.8: DCN carries only
data-parallel traffic — here the replicated-output gather and (in
training) the gradient all-reduce.
"""
import os
import socket
import subprocess
import sys

import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_mesh_plan_parity():
    # Bounded by the 540 s communicate() timeout below, not a plugin mark.
    port = _free_port()
    env = dict(os.environ)
    # The child pins its own JAX_PLATFORMS/XLA_FLAGS before importing jax.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_DIR, "_multihost_child.py"),
             str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0 and f"[{pid}] MULTIHOST_OK" in out, (
            f"process {pid} failed (rc={rc})\nstdout:\n{out[-2000:]}\n"
            f"stderr:\n{err[-2000:]}"
        )
