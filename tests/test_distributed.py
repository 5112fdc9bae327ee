"""Multi-process distributed execution: 2 processes x 4 virtual CPU devices.

The mesh spans processes (jax.distributed + Gloo CPU collectives); index
parts are sharded over the 'part' axis, blocks over 'data'; per-part counts
merge with psum on the (simulated) interconnect.  The result must equal the
local single-process computation.  This is the counterpart of SURVEY §2.10's
"distributed communication backend" row — the reference has none.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.timeout(1200)
@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "helpers", "dist_worker.py")
    port = _free_port()
    env_base = {
        k: v for k, v in os.environ.items() if not k.startswith("GENMAP_DIST")
    }
    # the workers set their own XLA_FLAGS / platform
    env_base.pop("XLA_FLAGS", None)
    procs = []
    for i in range(2):
        env = dict(
            env_base,
            GENMAP_DIST_COORDINATOR=f"localhost:{port}",
            GENMAP_DIST_NPROCS="2",
            GENMAP_DIST_PROC_ID=str(i),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=str(tmp_path),
            )
        )
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "distributed == local OK" in out
