"""Real multi-PROCESS data parallelism: two jax.distributed processes
(4 CPU devices each) must train the tiny Mask R-CNN step and produce the
same losses as one process over the same 8-device mesh.

This exercises the actual multi-host path — jax.distributed.initialize,
make_array_from_process_local_data batch assembly, replicated-state
construction — not just a single-process multi-device mesh (that is
tests/test_multichip.py's job).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_CHILD = os.path.join(os.path.dirname(__file__), "multihost_child.py")


def _run(pid: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the child pins cpu via jax.config
    return subprocess.Popen(
        [sys.executable, _CHILD, str(pid), str(port)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=env,
    )


def _metrics(proc: subprocess.Popen, timeout=1500):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"child failed:\n{err[-3000:]}"
    line = next(l for l in out.splitlines() if l.startswith("METRICS "))
    return json.loads(line[len("METRICS "):])


def test_two_process_training_matches_single_process():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    p0 = _run(0, port)
    p1 = _run(1, port)
    # NOTE: do not launch the single-process reference concurrently here —
    # measured on this 1-core host, a third compiling child starves the
    # pair's Gloo handshake past its 30 s deadline (flaky fail). The
    # persistent compile cache in multihost_child.py is the wall saver.
    m0 = _metrics(p0)
    m1 = _metrics(p1)
    # replicated metrics: both processes observe the same global values
    for a, b in zip(m0, m1):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, err_msg=k)
    assert all(np.isfinite(list(step.values())).all() for step in m0)

    # single-process reference over the same 8-device mesh and batches
    ref = _metrics(_run(-1, port))
    for a, r in zip(m0, ref):
        for k in a:
            np.testing.assert_allclose(a[k], r[k], rtol=1e-4, err_msg=k)
